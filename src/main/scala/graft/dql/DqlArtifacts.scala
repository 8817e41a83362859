package graft.dql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.pipeline.Similarity

/** Memoized similarity-index artifacts behind the DQL registry's
  * `sim_*` table functions (r15 verdict: the registry dispatched only
  * the brute rung, leaving the whole indexed ladder unreachable from
  * the language). These mirror the reference's posture of registering
  * every operator flavor into the language (`src/dqe.erl:62-122`) and
  * this engine's sanctioned-artifact cost model: the index is built
  * ONCE per (session, corpus) — storage provisioning on the refresh
  * cadence — and every DQL query probes it warm. Registered with
  * [[graft.core.Caches.registerArtifactCache]], so a refreshed corpus
  * dir invalidates through the standard evictArtifacts hook.
  *
  * Sizing (r16 verdict #3): index sizing is conf-first —
  * `spark.graft.dql.sim.ncells` / `spark.graft.dql.sim.bits` pin
  * explicit values (the oracle harness pins the fixture constants
  * [[NCells]]/[[Bits]] so the mirrored SQL stays exact); with the
  * confs UNSET the defaults are corpus-scaled: nCells = ⌈√n⌉ (the
  * standard IVF balance — per-query work nProbe·n/nCells against
  * nCells centroid distances both land at ~√n) and
  * bits = ⌈log₂(n / [[BucketTarget]])⌉ clamped to [1, 24] (expected
  * ~BucketTarget vectors per LSH bucket). The corpus count is one
  * job per (session, corpus), memoized beside the artifacts it
  * sizes. Exactness is sizing-INVARIANT on the exact spellings
  * (`sim_topk`/`sim_range` probe ALL cells and every corpus vector
  * lives in exactly one cell) — the `dql_pipeline_simtopk_sized`
  * gate pins that at a non-default nCells against the brute oracle.
  */
object DqlArtifacts {

  /** fixture-pinned oracle constants — what the sizing-DEPENDENT gate
    * oracles (probed top-k, LSH range) bake in; Verify/Bench/spec
    * sessions pin the sizing confs to these
    */
  val NCells = 8
  val Bits = 4
  /** auto-sizing target: expected vectors per LSH bucket */
  val BucketTarget = 64L
  val Dim: Int = graft.core.Tables.EmbeddingDim

  private val countCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), java.lang.Long])

  private def posInt(conf: String, raw: String): Int = {
    val v = try raw.trim.toInt catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$conf must be a positive integer, got '$raw'")
    }
    if (v < 1) throw new IllegalArgumentException(
      s"$conf must be a positive integer, got '$raw'")
    v
  }

  /** ONLY the corpus count memoizes (one job per (session, corpus));
    * the conf pins are read LIVE on every lookup — a conf change after
    * the first query must take effect, not be silently ignored (the
    * same conf-flip hazard class CompileOpts closed on the streaming
    * side). Note the INDEX artifacts themselves are keyed by the
    * nCells/bits they were built at, so a sizing change builds a new
    * artifact and never mutates a live one.
    */
  private def corpusN(spark: SparkSession, store: SeriesStore): Long =
    countCache.computeIfAbsent((spark, store.corpusKey), { _ =>
      Long.box(math.max(1L, store.table(spark, "embeddings").count()))
    })

  /** production IVF cell count for this (session, corpus) — conf pin
    * first (read live), else ⌈√corpus⌉ */
  def nCells(spark: SparkSession, store: SeriesStore): Int =
    spark.conf.getOption("spark.graft.dql.sim.ncells")
      .map(posInt("spark.graft.dql.sim.ncells", _))
      .getOrElse(math.max(1.0,
        math.ceil(math.sqrt(corpusN(spark, store).toDouble))).toInt)

  /** production LSH hyperplane count — conf pin first (read live),
    * else ⌈log₂(corpus / BucketTarget)⌉ in [1, 24] */
  def bits(spark: SparkSession, store: SeriesStore): Int =
    spark.conf.getOption("spark.graft.dql.sim.bits")
      .map(posInt("spark.graft.dql.sim.bits", _))
      .getOrElse {
        val target = math.max(1.0,
          corpusN(spark, store).toDouble / BucketTarget)
        math.min(24, math.max(1,
          math.ceil(math.log(target) / math.log(2.0)).toInt))
      }

  private val ivfCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, Int), (DataFrame, DataFrame)])

  private val lshCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, Int), DataFrame])

  /** The (cells, cents) IVF index over the store's embeddings table:
    * cell-assigned corpus (vec_id, embedding, nrm, cell) plus the
    * centroid quantizer — both pinned and sanctioned (materialized
    * storage the queries read, never rebuild).
    */
  def ivfIndex(spark: SparkSession, store: SeriesStore,
               nCells: Int = NCells): (DataFrame, DataFrame) =
    ivfCache.computeIfAbsent((spark, store.corpusKey, nCells), { _ =>
      val emb = store.table(spark, "embeddings")
      val cells = graft.core.Caches.sanction(
        Similarity.ivfCells(emb, nCells)
          .persist(StorageLevel.MEMORY_AND_DISK))
      val cents = graft.core.Caches.sanction(
        Similarity.ivfCents(emb, nCells)
          .persist(StorageLevel.MEMORY_AND_DISK))
      (cells, cents)
    })

  /** The hyperplane-sign band index over the store's embeddings table
    * ([[Similarity.lshPrep]] shape), pinned and sanctioned.
    */
  def lshIndex(spark: SparkSession, store: SeriesStore,
               bits: Int = Bits): DataFrame =
    lshCache.computeIfAbsent((spark, store.corpusKey, bits), { _ =>
      graft.core.Caches.sanction(
        Similarity.lshPrep(store.table(spark, "embeddings"), bits, Dim)
          .persist(StorageLevel.MEMORY_AND_DISK))
    })

  /** fixture-pinned PQ shape constants (what the `dql_pipeline_simtopk_pq`
    * oracle bakes in) — conf-first like the other sizing knobs:
    * `spark.graft.dql.sim.pq.m` / `.ksub` pin explicit values, read live;
    * unset falls back to these (m = 8 subspaces of Dim/8 dims, ksub = 16
    * entries — 8 codes/vector, the 32× compression rung).
    */
  val PqM = 8
  val PqKsub = 16

  def pqM(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.dql.sim.pq.m")
      .map(posInt("spark.graft.dql.sim.pq.m", _)).getOrElse(PqM)

  def pqKsub(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.dql.sim.pq.ksub")
      .map(posInt("spark.graft.dql.sim.pq.ksub", _)).getOrElse(PqKsub)

  private val sq8Cache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, Int), (DataFrame, DataFrame)])

  private val pqCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, Int, Int, Int),
      (DataFrame, DataFrame, DataFrame)])

  /** The scalar-quantized (int8) IVF index over the store's embeddings —
    * (idx, cents) with `idx` the [[Similarity.sq8Quantize]] table (one
    * byte per dimension + per-vector grid: the 4×-smaller RESIDENT form
    * of [[ivfIndex]]'s cells), pinned and sanctioned per (session,
    * corpus, nCells). Built over the same cell assignment as
    * [[ivfIndex]] (shares its memo), so cell ids coincide across rungs.
    */
  def sq8Index(spark: SparkSession, store: SeriesStore,
               nCells: Int = NCells): (DataFrame, DataFrame) =
    sq8Cache.computeIfAbsent((spark, store.corpusKey, nCells), { _ =>
      val (cells, cents) = ivfIndex(spark, store, nCells)
      (graft.core.Caches.sanction(
        Similarity.sq8Quantize(cells)
          .persist(StorageLevel.MEMORY_AND_DISK)), cents)
    })

  /** The product-quantized IVF index — (idx, cbsRow, cents) with `idx`
    * the [[Similarity.pqEncode]] codes table (m small ints per vector:
    * the bottom rung of the resident-memory ladder) and `cbsRow` the
    * packed codebook row the ADC tables derive from; pinned and
    * sanctioned per (session, corpus, nCells, m, ksub). Cells shared
    * with [[ivfIndex]] as above.
    */
  def pqIndex(spark: SparkSession, store: SeriesStore, nCells: Int,
              m: Int, ksub: Int): (DataFrame, DataFrame, DataFrame) =
    pqCache.computeIfAbsent((spark, store.corpusKey, nCells, m, ksub), { _ =>
      val (cells, cents) = ivfIndex(spark, store, nCells)
      val cbsRow = graft.core.Caches.sanction(
        Similarity.pqPacked(Similarity.pqCodebooks(
          store.table(spark, "embeddings"), m, ksub, Dim))
          .persist(StorageLevel.MEMORY_AND_DISK))
      val idx = graft.core.Caches.sanction(
        Similarity.pqEncode(cells, cbsRow, m, Dim)
          .persist(StorageLevel.MEMORY_AND_DISK))
      (idx, cbsRow, cents)
    })

  private val refreshCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, String, Int), (DataFrame, DataFrame)])

  /** Eviction-vs-append refresh policy for the memoized IVF artifact
    * (r16 verdict #6): fold a corpus-refresh `delta` (embeddings
    * shape: vec_id, embedding) into the (session, corpus) index,
    * memoized per `deltaId` so one refresh batch maintains the index
    * once and every subsequent query reads it warm.
    *
    *   - APPEND when every delta vec_id is NEW to the indexed corpus:
    *     the delta alone is assigned against the FROZEN quantizer
    *     ([[Similarity.ivfAssign]] — centroids unchanged until the
    *     next scheduled retrain, the FAISS add-without-train posture)
    *     and unioned into the cells artifact; the base corpus is never
    *     re-assigned. Whenever the rebuild's quantizer would be the
    *     same centroid rows, append ≡ rebuild bit-for-bit — the gate
    *     pins all-cells search over an appended artifact against the
    *     full-corpus BRUTE oracle.
    *   - REBUILD when any delta id overlaps the index: an update
    *     in-place invalidates cell contents no algebraic merge can
    *     repair, so the index rebuilds over (base − delta ids) ∪ delta
    *     with a fresh quantizer.
    *
    * The overlap probe is one corpus scan with the delta's ids
    * broadcast — never a corpus shuffle. The base (store-keyed)
    * artifact is left in place: it still reflects the store's own
    * table, and the appended artifact's lineage reads its pin.
    *
    * CONTRACT — `deltaId` must uniquely identify the refresh batch's
    * CONTENT (the caller's refresh-ledger key: batch sequence number,
    * input-file manifest hash, …). The memo trusts it: calling again
    * with the same id and DIFFERENT delta rows returns the artifact
    * built from the first call's rows, silently. There is no content
    * fingerprint here by design — fingerprinting would re-scan the
    * delta on every warm lookup, defeating the memo; a retry with
    * corrected data must use a NEW id (or evictArtifacts the corpus).
    */
  def ivfRefresh(spark: SparkSession, store: SeriesStore,
                 deltaId: String, delta: DataFrame,
                 nCellsOverride: Int = 0): (DataFrame, DataFrame) = {
    require(deltaId.nonEmpty, "ivfRefresh: deltaId must be non-empty " +
      "(it keys the refresh memo — see the content contract)")
    val nc =
      if (nCellsOverride > 0) nCellsOverride else nCells(spark, store)
    refreshCache.computeIfAbsent(
      (spark, store.corpusKey, deltaId, nc), { _ =>
        import org.apache.spark.sql.functions.{broadcast, col}
        val (baseCells, cents) = ivfIndex(spark, store, nc)
        val deltaIds = delta.select(col("vec_id"))
        val overlaps = !baseCells
          .join(broadcast(deltaIds), Seq("vec_id"), "left_semi").isEmpty
        if (!overlaps) {
          val appended = graft.core.Caches.sanction(
            baseCells.unionByName(Similarity.ivfAssign(delta, cents))
              .persist(StorageLevel.MEMORY_AND_DISK))
          (appended, cents)
        } else {
          val full = store.table(spark, "embeddings")
            .join(broadcast(deltaIds), Seq("vec_id"), "left_anti")
            .unionByName(delta)
          val cells = graft.core.Caches.sanction(
            Similarity.ivfCells(full, nc)
              .persist(StorageLevel.MEMORY_AND_DISK))
          val newCents = graft.core.Caches.sanction(
            Similarity.ivfCents(full, nc)
              .persist(StorageLevel.MEMORY_AND_DISK))
          (cells, newCents)
        }
      })
  }

  private val bandCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), DataFrame])

  /** The corpus near-dup band index
    * ([[graft.pipeline.Dedup.bandIndex]] schema), pinned and
    * sanctioned per (session, corpus) — the batch-refreshed artifact
    * the streaming `dedup_minhash` probe
    * ([[graft.streaming.StreamingPipelineDql]]) and the harness's
    * near-dup gates read; one artifact shared by every consumer of
    * the same corpus.
    */
  def bandIndex(spark: SparkSession, store: SeriesStore): DataFrame =
    bandCache.computeIfAbsent((spark, store.corpusKey), { _ =>
      graft.core.Caches.sanction(
        graft.pipeline.Dedup.bandIndex(store.table(spark, "documents"))
          .persist(StorageLevel.MEMORY_AND_DISK))
    })

  private val bandRefreshCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, String), DataFrame])

  /** Eviction-vs-append refresh for the near-dup band index — the
    * [[ivfRefresh]] policy applied to the OTHER shared index artifact
    * (r17 review: the IVF artifact gained a refresh policy, the band
    * index still evicted wholesale on every corpus change). Band-index
    * rows are a pure per-doc function of each document's own shingles,
    * so maintenance is the cheapest algebraic case:
    *
    *   - APPEND when every delta doc_id is NEW to the corpus:
    *     signatures compute for the DELTA ONLY
    *     ([[graft.pipeline.Dedup.bandIndexAppend]] — the base corpus is
    *     never re-shingled), and because (doc, band) keys are disjoint
    *     under append the result ≡ a full rebuild bit-for-bit
    *     (BandIndexSpec's standing invariant).
    *   - REBUILD on any id overlap: an in-place text update invalidates
    *     that doc's bands and shingle set, so the index rebuilds over
    *     (base − delta ids) ∪ delta.
    *
    * Same `deltaId` CONTENT contract as [[ivfRefresh]] (the memo trusts
    * the caller's refresh-ledger key; a retry with corrected rows needs
    * a new id or an evictArtifacts). `delta` has the documents shape
    * (doc_id, text).
    */
  def bandRefresh(spark: SparkSession, store: SeriesStore,
                  deltaId: String, delta: DataFrame): DataFrame = {
    require(deltaId.nonEmpty, "bandRefresh: deltaId must be non-empty " +
      "(it keys the refresh memo — see the content contract)")
    bandRefreshCache.computeIfAbsent(
      (spark, store.corpusKey, deltaId), { _ =>
        import org.apache.spark.sql.functions.{broadcast, col}
        val base = bandIndex(spark, store)
        val deltaIds = delta.select(col("doc_id"))
        val overlaps = !base
          .join(broadcast(deltaIds), Seq("doc_id"), "left_semi").isEmpty
        val refreshed =
          if (!overlaps)
            graft.pipeline.Dedup.bandIndexAppend(base, delta)
          else
            graft.pipeline.Dedup.bandIndex(
              store.table(spark, "documents")
                .join(broadcast(deltaIds), Seq("doc_id"), "left_anti")
                .unionByName(delta))
        graft.core.Caches.sanction(
          refreshed.persist(StorageLevel.MEMORY_AND_DISK))
      })
  }

  private val lshRefreshCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, String, Int), DataFrame])

  /** [[ivfRefresh]]'s policy for the LSH band-index artifact: the
    * hyperplane-sign bucketing ([[graft.pipeline.Similarity.lshPrep]])
    * is row-local, so an all-new delta appends as a delta-only prep +
    * union (≡ rebuild bit-for-bit — each row's bucket depends on
    * nothing but its own embedding); any id overlap rebuilds over
    * (base − delta ids) ∪ delta. Same `deltaId` content contract as
    * the other refreshes. `delta` has the embeddings shape
    * (vec_id, embedding).
    */
  def lshRefresh(spark: SparkSession, store: SeriesStore,
                 deltaId: String, delta: DataFrame,
                 bitsOverride: Int = 0): DataFrame = {
    require(deltaId.nonEmpty, "lshRefresh: deltaId must be non-empty " +
      "(it keys the refresh memo — see the content contract)")
    val b = if (bitsOverride > 0) bitsOverride else bits(spark, store)
    lshRefreshCache.computeIfAbsent(
      (spark, store.corpusKey, deltaId, b), { _ =>
        import org.apache.spark.sql.functions.{broadcast, col}
        val base = lshIndex(spark, store, b)
        val deltaIds = delta.select(col("vec_id"))
        val overlaps = !base
          .join(broadcast(deltaIds), Seq("vec_id"), "left_semi").isEmpty
        val refreshed =
          if (!overlaps)
            base.unionByName(Similarity.lshPrep(delta, b, Dim))
          else
            Similarity.lshPrep(
              store.table(spark, "embeddings")
                .join(broadcast(deltaIds), Seq("vec_id"), "left_anti")
                .unionByName(delta), b, Dim)
        graft.core.Caches.sanction(
          refreshed.persist(StorageLevel.MEMORY_AND_DISK))
      })
  }

  private val gramCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, Int), DataFrame])

  private val gramCanonCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, Int), DataFrame])

  private val gramCountsCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, Int), DataFrame])

  private val gramCanonCountsCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, Int), DataFrame])

  /** The MAINTAINABLE gram artifact — per-hash occurrence counts
    * ([[graft.pipeline.Dedup.gramCounts]]), pinned and sanctioned per
    * (session, corpus, n). This is the table production materializes
    * when the corpus grows incrementally (Dedup's own contract: counts
    * merge under append, the duplicated-hash set does not), so the
    * refresh path ([[gramRefresh]]) folds deltas into IT and the
    * consumer-facing [[dupGrams]] is its `c > 1` projection.
    */
  def gramCounts(spark: SparkSession, store: SeriesStore,
                 n: Int): DataFrame =
    gramCountsCache.computeIfAbsent((spark, store.corpusKey, n), { _ =>
      graft.core.Caches.sanction(
        graft.pipeline.Dedup.gramCounts(store.table(spark, "documents"), n)
          .persist(StorageLevel.MEMORY_AND_DISK))
    })

  /** The keep-first maintainable twin
    * ([[graft.pipeline.Dedup.gramCountsCanon]] — counts plus packed
    * canonical-occurrence keys, both algebraically mergeable under
    * append: counts add, keys min).
    */
  def gramCountsCanon(spark: SparkSession, store: SeriesStore,
                      n: Int): DataFrame =
    gramCanonCountsCache.computeIfAbsent((spark, store.corpusKey, n), { _ =>
      graft.core.Caches.sanction(
        graft.pipeline.Dedup.gramCountsCanon(
          store.table(spark, "documents"), n)
          .persist(StorageLevel.MEMORY_AND_DISK))
    })

  /** The corpus duplicated-gram artifact
    * ([[graft.pipeline.Dedup.dupGrams]] — window hashes occurring more
    * than once corpus-wide), pinned and sanctioned per (session,
    * corpus, n): the `c > 1` projection of the maintainable
    * [[gramCounts]] artifact (one corpus scan feeds both). The
    * batch-refreshed table the streaming span/scrub probes and the
    * streaming DQL `scrub` spelling read — one artifact per corpus
    * shared by every consumer (the bandIndex posture).
    */
  def dupGrams(spark: SparkSession, store: SeriesStore, n: Int): DataFrame =
    gramCache.computeIfAbsent((spark, store.corpusKey, n), { _ =>
      graft.core.Caches.sanction(
        graft.pipeline.Dedup.dupGramsOf(gramCounts(spark, store, n))
          .persist(StorageLevel.MEMORY_AND_DISK))
    })

  /** The keep-first companion ([[graft.pipeline.Dedup.dupGramsWithCanon]]
    * — duplicated hashes WITH their packed canonical-occurrence keys),
    * the projection of [[gramCountsCanon]]; read by the streaming
    * keep-first scrub and the streaming DQL `scrub_keepfirst` spelling.
    */
  def dupGramsCanon(spark: SparkSession, store: SeriesStore,
                    n: Int): DataFrame =
    gramCanonCache.computeIfAbsent((spark, store.corpusKey, n), { _ =>
      graft.core.Caches.sanction(
        graft.pipeline.Dedup.dupGramsWithCanonOf(
          gramCountsCanon(spark, store, n))
          .persist(StorageLevel.MEMORY_AND_DISK))
    })

  private val gramRefreshCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, String, Int), DataFrame])

  private val gramCanonRefreshCache =
    graft.core.Caches.registerArtifactCache(
      new java.util.concurrent.ConcurrentHashMap[
        (SparkSession, String, String, Int), DataFrame])

  /** Eviction-vs-append refresh for the duplicated-gram artifact — the
    * [[ivfRefresh]] policy on the LAST shared artifact family without
    * one. All-new delta doc ids → APPEND: the delta's counts fold into
    * the resident [[gramCounts]] artifact with ONE keyed full-outer
    * merge ([[graft.pipeline.Dedup.gramCountsAppend]] — the base corpus
    * is never re-scanned), and the refreshed duplicated-hash set is the
    * merged counts' projection (≡ a full rebuild by the counts algebra).
    * Any id overlap → REBUILD over (base − delta ids) ∪ delta (a text
    * update invalidates counts no merge can repair — the old text is
    * gone). Same deltaId content contract and memoization as the other
    * refreshes. Returns the refreshed [[dupGrams]]-shaped projection.
    */
  def gramRefresh(spark: SparkSession, store: SeriesStore, deltaId: String,
                  delta: DataFrame, n: Int): DataFrame = {
    require(deltaId.nonEmpty, "gramRefresh: deltaId must be non-empty " +
      "(it keys the refresh memo — see the content contract)")
    gramRefreshCache.computeIfAbsent(
      (spark, store.corpusKey, deltaId, n), { _ =>
        import org.apache.spark.sql.functions.{broadcast, col}
        val deltaIds = delta.select(col("doc_id"))
        val overlaps = !store.table(spark, "documents")
          .join(broadcast(deltaIds), Seq("doc_id"), "left_semi").isEmpty
        val refreshed =
          if (!overlaps)
            graft.pipeline.Dedup.dupGramsOf(
              graft.pipeline.Dedup.gramCountsAppend(
                gramCounts(spark, store, n), delta, n))
          else
            graft.pipeline.Dedup.dupGrams(
              store.table(spark, "documents")
                .join(broadcast(deltaIds), Seq("doc_id"), "left_anti")
                .unionByName(delta), n)
        graft.core.Caches.sanction(
          refreshed.persist(StorageLevel.MEMORY_AND_DISK))
      })
  }

  /** [[gramRefresh]] for the keep-first artifact: counts add, canonical
    * keys min ([[graft.pipeline.Dedup.gramCountsCanonAppend]]) on the
    * append path; rebuild on overlap. Returns the refreshed
    * [[dupGramsCanon]]-shaped projection.
    */
  def gramCanonRefresh(spark: SparkSession, store: SeriesStore,
                       deltaId: String, delta: DataFrame,
                       n: Int): DataFrame = {
    require(deltaId.nonEmpty, "gramCanonRefresh: deltaId must be " +
      "non-empty (it keys the refresh memo — see the content contract)")
    gramCanonRefreshCache.computeIfAbsent(
      (spark, store.corpusKey, deltaId, n), { _ =>
        import org.apache.spark.sql.functions.{broadcast, col}
        val deltaIds = delta.select(col("doc_id"))
        val overlaps = !store.table(spark, "documents")
          .join(broadcast(deltaIds), Seq("doc_id"), "left_semi").isEmpty
        val refreshed =
          if (!overlaps)
            graft.pipeline.Dedup.dupGramsWithCanonOf(
              graft.pipeline.Dedup.gramCountsCanonAppend(
                gramCountsCanon(spark, store, n), delta, n))
          else
            graft.pipeline.Dedup.dupGramsWithCanon(
              store.table(spark, "documents")
                .join(broadcast(deltaIds), Seq("doc_id"), "left_anti")
                .unionByName(delta), n)
        graft.core.Caches.sanction(
          refreshed.persist(StorageLevel.MEMORY_AND_DISK))
      })
  }

  private val clsCache = graft.core.Caches.registerArtifactCache(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, Int, Int, Double, Int, Double),
      Array[Double]])

  /** FROZEN held-out classifier weights for the `quality_trained` /
    * `threshold_scan` registry functions: trained ONCE per (session,
    * corpus, hyperparams) on the train side of the deterministic hash
    * split ([[graft.pipeline.Curation.onSplit]]) — the deployed-filter
    * posture where training is model provisioning on the refresh
    * cadence and every query is a frozen-weights scoring scan.
    * Driver-local model state (dim+2 doubles), bounded by the feature
    * dimension, never the corpus.
    */
  def heldOutWeights(spark: SparkSession, store: SeriesStore, dim: Int,
                     rounds: Int, lr: Double, minWords: Int,
                     valFrac: Double): Array[Double] =
    clsCache.computeIfAbsent(
      (spark, store.corpusKey, dim, rounds, lr, minWords, valFrac), { _ =>
        graft.pipeline.Classifier.trainWeights(
          graft.pipeline.Curation.onSplit(
            store.table(spark, "documents"), valFrac, "train"),
          dim, rounds, lr, minWords).map(_.doubleValue)
      })
}
