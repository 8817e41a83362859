package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Session-scoped cache governance for pipeline builders.
  *
  * Two cache lifetimes exist in this engine:
  *
  *   - SANCTIONED artifacts model materialized storage: the series table
  *     ([[SeriesOps.series]]) and the minhash near-dup pair set
  *     ([[graft.entry.PipelineQueries]]). Production queries READ these
  *     instead of re-deriving them; their one-off build cost is storage
  *     provisioning, not query time. They live for the session.
  *   - TRANSIENT pins are builder intermediates (shingle tables, candidate
  *     pair sets, ANN cell assignments) persisted because one query's plan
  *     consumes them several times. They are registered here at build time
  *     and released en masse with [[releaseTransient]] — after a query in
  *     the bench loop, after verification, or whenever the caller wants
  *     storage back.
  *
  * Staleness contract: Spark's CacheManager substitutes any cached plan by
  * canonical equality, so a pinned frame SHADOWS recomputation — if the
  * underlying parquet is overwritten mid-session, pinned results serve the
  * old data until released. Callers that rewrite inputs must call
  * [[releaseTransient]] (and rebuild sanctioned artifacts) first.
  *
  * Registration is identity-based (Dataset does not override equals);
  * memoizing call-sites hand the same object in, so promotion from
  * transient to sanctioned is a set lookup.
  */
object Caches {
  private val pinned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()
  private val sanctionedDfs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()

  /** Register a persisted frame for deferred release. Lazy — nothing is
    * materialized here; the frame caches on its first action.
    */
  def deferRelease(df: DataFrame): DataFrame = { pinned.add(df); df }

  /** Promote a persisted frame to session-lifetime materialized artifact:
    * [[releaseTransient]] will never unpersist it.
    */
  def sanction(df: DataFrame): DataFrame = { sanctionedDfs.add(df); df }

  /** Unpersist ONE deferred pin immediately and drop it from the registry
    * — for builders whose results are fully driver-local before they
    * return (PCA loadings, Lloyd codebooks): their scratch caches must
    * not outlive the call, because CacheManager substitutes by canonical
    * equality and a later scoring scan over the SAME shaped plan (e.g.
    * [[graft.pipeline.Pca.projectK]]'s centered corpus vs the trainer's
    * pinned one) would silently read the warm training cache — which the
    * bench contamination assertion rightly fails as measuring a cache
    * scan. Sanctioned artifacts are never released here.
    */
  def release(df: DataFrame, blocking: Boolean = false): Unit =
    if (!sanctionedDfs.contains(df)) {
      df.unpersist(blocking = blocking)
      pinned.remove(df)
    }

  /** Unpersist every transient pin belonging to `spark`; returns how many
    * were released. Sanctioned artifacts survive.
    *
    * `blocking = true` waits for the block manager to actually drop the
    * blocks before returning. The bench MUST use it: with async release,
    * the eviction RPCs and the freed-memory accounting land during the
    * NEXT timed query — measured in round 4 as a broad 2–4× inflation of
    * whichever family ran after the heavy dedup queries (alphabetically,
    * `dql_*`).
    */
  def releaseTransient(spark: SparkSession, blocking: Boolean = false): Int = {
    var n = 0
    pinned.forEach { df =>
      if ((df.sparkSession eq spark) && !sanctionedDfs.contains(df)) {
        df.unpersist(blocking = blocking)
        pinned.remove(df)
        n += 1
      }
    }
    n
  }

  // -------------------------------------------- artifact-memo registry

  /** Registered (session, dir)-keyed memo caches — the gate harness's
    * band indexes, dup-gram tables, trained models. Registration gives
    * the staleness contract above its missing INVALIDATION hook: a
    * caller that regenerates the tables under a dir calls
    * [[evictArtifacts]] so a refreshed corpus can never pair with a
    * stale frozen artifact (r14 advisory).
    */
  private val artifactCaches = new java.util.concurrent
    .ConcurrentLinkedQueue[java.util.concurrent.ConcurrentHashMap[_, _]]()

  // ---- construction-time artifact-read tracing (bench {cold, warm}) --
  //
  // Several gates consume a memoized artifact ENTIRELY at plan
  // construction (eager localCheckpoint, driver-collected model state),
  // so the final plan shows no InMemoryRelation to introspect. The memo
  // maps themselves are the one common chokepoint: every accessor goes
  // through a registered map, so a tracing subclass notes warm hits and
  // cold builds into a thread-local the bench brackets around each
  // timed construction / warmup step. Zero cost when no trace is active.

  private val traceBuf =
    new ThreadLocal[scala.collection.mutable.LinkedHashSet[(String, String)]]

  private def note(kind: String, label: String): Unit = {
    val b = traceBuf.get()
    if (b != null) { b += ((kind, label)); () }
  }

  /** Run `body` collecting (reads, builds) of registered memo artifacts
    * on THIS thread: `reads` are warm memo hits, `builds` are entries the
    * body itself created (it paid for them). Labels are the registering
    * call-site (`File.scala:line`).
    */
  def traceArtifacts[T](body: => T): (T, Seq[String], Seq[String]) = {
    val b = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    traceBuf.set(b)
    try {
      val r = body
      (r, b.collect { case ("read", l) => l }.toSeq,
        b.collect { case ("build", l) => l }.toSeq)
    } finally traceBuf.remove()
  }

  private final class TracingMap[K, V](label: String)
      extends java.util.concurrent.ConcurrentHashMap[K, V] {
    override def computeIfAbsent(
        key: K, f: java.util.function.Function[_ >: K, _ <: V]): V = {
      // read-vs-build decided by whether the mapping function actually
      // ran — exact even when two threads race on a first access (a
      // pre-check of containsKey would mislabel the loser's warm read
      // as a cold build)
      var built = false
      val v = super.computeIfAbsent(key,
        (k: K) => { built = true; f(k) })
      note(if (built) "build" else "read", label)
      v
    }
    override def get(key: Any): V = {
      val v = super.get(key)
      if (v.asInstanceOf[AnyRef] ne null) note("read", label)
      v
    }
  }

  /** Register a memo cache whose keys are products carrying the
    * SparkSession and the data dir (e.g. `(SparkSession, String)` or
    * `(SparkSession, String, Double)`). Returns the map for inline use —
    * a TRACING map (the passed instance is expected empty and is only a
    * type witness), labeled by the registering call-site.
    */
  def registerArtifactCache[K, V](
      m: java.util.concurrent.ConcurrentHashMap[K, V])
      : java.util.concurrent.ConcurrentHashMap[K, V] = {
    val label = Thread.currentThread.getStackTrace
      .find(f => !f.getClassName.startsWith("java.") &&
        !f.getClassName.contains("graft.core.Caches") &&
        !f.getClassName.startsWith("scala."))
      .map(f => s"${f.getFileName}:${f.getLineNumber}")
      .getOrElse("artifact")
    val t = new TracingMap[K, V](label)
    artifactCaches.add(t)
    t
  }

  /** Drop every registered memo entry scoped to (spark, dir), releasing
    * any persisted frames the value carries (directly or inside a
    * product, e.g. an (index, centroids) pair). Returns how many entries
    * were evicted. The next consumer rebuilds from current storage.
    *
    * Also invalidates the CacheManager's PLAN-EQUALITY caches whose
    * relations read files under `dir` (`recacheByPath`): without this, a
    * cached frame built over the old contents — not necessarily one this
    * registry knows about — would keep serving stale blocks to any
    * canonically-equal subplan, and the memo rebuild itself could read
    * it (r15 advisory: the doc promised "a refreshed corpus can never
    * pair with a stale frozen artifact", the hook alone delivered less).
    */
  def evictArtifacts(spark: SparkSession, dir: String): Int = {
    org.apache.spark.sql.GraftBridge.recacheByPath(spark, dir)
    def unpersistIn(v: Any): Unit = v match {
      case df: DataFrame =>
        sanctionedDfs.remove(df)
        pinned.remove(df)
        df.unpersist(blocking = true)
      case p: Product => p.productIterator.foreach(unpersistIn)
      case _ => ()
    }
    var n = 0
    artifactCaches.forEach { m =>
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val hit = e.getKey match {
          case p: Product =>
            p.productIterator.exists(_.asInstanceOf[AnyRef] eq spark) &&
              p.productIterator.exists {
                // a key element `<dir>#<suffix>` is the SUB-CORPUS
                // convention (a store over a subset/derived view of
                // `dir` — e.g. the IVF refresh gate's base-subset
                // store): its artifacts derive from the same files,
                // so a refresh of `dir` must invalidate them too, or
                // a stale frozen artifact pairs with fresh data (the
                // r15 advisory class)
                case s: String => s == dir || s.startsWith(dir + "#")
                case _ => false
              }
          case _ => false
        }
        if (hit) {
          unpersistIn(e.getValue)
          it.remove()
          n += 1
        }
      }
    }
    n
  }

  /** The cache-builder instances (CacheManager's unit of substitution)
    * behind the sanctioned artifacts of `spark`. Object identity is the
    * comparison key: the CacheManager hands the same builder instance to
    * every plan it substitutes the cached relation into.
    */
  def sanctionedBuilders(spark: SparkSession): Seq[AnyRef] = {
    val out = Seq.newBuilder[AnyRef]
    sanctionedDfs.forEach { df =>
      if (df.sparkSession eq spark)
        out ++= df.queryExecution.withCachedData.collect {
          case r: InMemoryRelation => r.cacheBuilder
        }
    }
    out.result()
  }

  /** Residency pin for the bench: sanctioned artifacts model materialized
    * storage, so a timed consumer must READ them, never rebuild them — but
    * the block manager can partially evict even MEMORY_AND_DISK blocks
    * under churn (measured in round 6: `corpus_decisions` billed a pair-set
    * rebuild, 7 s vs 1.2 s steady). This re-materializes every sanctioned
    * artifact of `spark` whose cached RDD is missing blocks and returns
    * the names it re-forced (empty = all resident); callers run it OUTSIDE
    * the timed region and log any non-empty result.
    */
  def ensureSanctionedResident(spark: SparkSession): Seq[String] = {
    val out = Seq.newBuilder[String]
    sanctionedDfs.forEach { df =>
      if (df.sparkSession eq spark) {
        val builders = df.queryExecution.withCachedData.collect {
          case r: InMemoryRelation => r.cacheBuilder
        }
        val stale = builders.filter { b =>
          !b.isCachedColumnBuffersLoaded || {
            val id = b.cachedColumnBuffers.id
            !spark.sparkContext.getRDDStorageInfo.find(_.id == id)
              .exists(i => i.numCachedPartitions == i.numPartitions)
          }
        }
        if (stale.nonEmpty) {
          df.count() // repopulates only the missing partitions
          // report only the builders that were actually missing blocks —
          // naming fully-resident siblings would misdirect an eviction
          // investigation
          out ++= stale.map(_.cachedName).distinct
        }
      }
    }
    out.result()
  }

  /** The cachedNames of `spark`'s sanctioned artifacts — the bench
    * attributes each name to the warmup step that first materialized it,
    * so the artifact can publish per-artifact COLD (build) seconds next
    * to the WARM (read) seconds of the gates that consume it.
    */
  def sanctionedNames(spark: SparkSession): Seq[String] = {
    val out = Seq.newBuilder[String]
    sanctionedDfs.forEach { df =>
      if (df.sparkSession eq spark)
        out ++= df.queryExecution.withCachedData.collect {
          case r: InMemoryRelation => r.cacheBuilder.cachedName
        }
    }
    out.result().distinct
  }

  /** The sanctioned artifacts `df`'s plan reads warm (by cachedName) —
    * the bench records these per timed gate so memo-backed gates carry
    * their cold-vs-warm split in the artifact.
    */
  def sanctionedReads(df: DataFrame, spark: SparkSession): Seq[String] = {
    val allowed = sanctionedBuilders(spark)
    df.queryExecution.withCachedData.collect {
      case r: InMemoryRelation if allowed.exists(_ eq r.cacheBuilder) =>
        r.cacheBuilder.cachedName
    }.distinct
  }

  /** Builders already MATERIALIZED in `spark`'s CacheManager — the bench
    * snapshots this immediately before constructing a timed plan;
    * contamination is then membership in the snapshot, not "loaded now"
    * (a builder the construction itself filled — Lloyd/PCA training
    * collects run inside the timed compile window — was paid for by the
    * timed run and is not contamination).
    */
  def materializedBuilders(spark: SparkSession): Seq[AnyRef] =
    org.apache.spark.sql.GraftBridge.materializedCacheBuilders(spark)

  /** Measurement-integrity check for the bench: the cached relations in
    * `df`'s plan whose column buffers were ALREADY materialized before
    * the plan was constructed (`preWarm` — a [[materializedBuilders]]
    * snapshot taken pre-construction) and are not in `allowed`. A hit
    * means the timed run would read a warm cache some earlier run
    * populated — the timing would measure a cache scan, not the
    * computation. Pins made (or filled) by `df`'s own construction are
    * fine: the timed run itself paid to fill them.
    */
  def contaminatedRelations(df: DataFrame, allowed: Seq[AnyRef],
                            preWarm: Seq[AnyRef]): Seq[String] =
    df.queryExecution.withCachedData.collect {
      case r: InMemoryRelation
        if preWarm.exists(_ eq r.cacheBuilder) &&
          !allowed.exists(_ eq r.cacheBuilder) =>
        r.cacheBuilder.cachedName
    }
}
