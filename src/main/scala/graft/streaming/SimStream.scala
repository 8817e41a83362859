package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.{Similarity, VectorOps}

/** Online ANN retrieval: a QUERY-EMBEDDING stream searched against the
  * static IVF index of a corpus — the similarity-search analog of
  * [[DocStream.nearDupAgainstIndex]]'s posture (the pairwise side is a
  * batch-refreshed materialized artifact, never stream-stream).
  *
  * Entirely STATELESS on the stream side. The index packs one row per
  * IVF cell (the cell's members as an array), so a query's whole search
  * is: one row-local centroid argmax (an `aggregate` fold over the
  * broadcast centroid array — nCells entries), ONE equi-join on the cell
  * id, then score + sort + slice INSIDE the joined row. No per-query
  * state, no window, no watermark; results stream out as queries arrive.
  * Every numeric step reuses the batch kernels ([[VectorOps.dot]]'s
  * fixed-point dot, the same cosine), and the tie-breaks (centroid id on
  * the assignment argmax; (cos DESC, vec_id ASC) on the ranking) are the
  * batch [[Similarity.ivfTopK]] orders, so stream and batch agree
  * bit-for-bit on the same (corpus, query) — property-tested
  * (SimStreamSpec) and gate-verified against the batch DuckDB oracle.
  *
  * Scale note: a packed cell row holds ~corpus/nCells vectors; nCells
  * grows with the corpus (the usual √n rule), keeping cell rows bounded
  * while the cell id stays the partition key of the inverted-file
  * layout. A corpus whose cells outgrow a row should probe with the
  * exploded-index + windowed-top-k form instead; at that size the
  * per-query candidate state, not this plan, is the limiting design.
  */
object SimStream {

  /** The packed search index: (cell, cands: array<struct<vec_id,
    * embedding, nrm>>) — members ordered by vec_id — plus the one-row
    * centroid array (cid-ordered). Both are batch artifacts; persist and
    * refresh them with the corpus.
    */
  def ivfIndex(emb: DataFrame, nCells: Int): (DataFrame, DataFrame) = {
    val packed = Similarity.ivfCells(emb, nCells)
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(
        struct(col("vec_id"), col("embedding"), col("nrm")))).as("cands"))
    val cents = Similarity.ivfCents(emb, nCells)
      .agg(sort_array(collect_list(
        struct(col("cid"), col("cvec"), col("cnrm")))).as("cents"))
    (packed, cents)
  }

  /** The scalar-quantized packed index: (cell, cands:
    * array<struct<vec_id, lo, step, code, dnrm>>) — int8 codes instead of
    * float32 embeddings, 4× less resident memory, which is the binding
    * constraint for the ALWAYS-LOADED streaming index (the batch engine
    * can spill its index; the online path cannot). Same one-row centroid
    * array as [[ivfIndex]].
    */
  def sq8Index(emb: DataFrame, nCells: Int): (DataFrame, DataFrame) = {
    val packed = Similarity.sq8Quantize(Similarity.ivfCells(emb, nCells))
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(
        struct(col("vec_id"), col("lo"), col("step"), col("code"),
          col("dnrm")))).as("cands"))
    val cents = Similarity.ivfCents(emb, nCells)
      .agg(sort_array(collect_list(
        struct(col("cid"), col("cvec"), col("cnrm")))).as("cents"))
    (packed, cents)
  }

  /** Top-k QUANTIZED cosine neighbors per query against the packed SQ8
    * index — the same stateless single-join shape as
    * [[topKAgainstIvfIndex]], with each candidate scored asymmetrically
    * (float query × dequantized int8 member, the batch
    * [[Similarity.ivfSq8QuantTopK]] kernel and tie-breaks, so stream ≡
    * batch bit-for-bit — SimStreamSq8Spec). No rerank stage on the
    * stream: a stateless plan cannot re-sort after a second join, so the
    * quantized ranking IS the online answer; pipe the result into the
    * batch [[Similarity.ivfSq8TopK]] rerank when exact cosines matter.
    */
  def topKAgainstSq8Index(queries: DataFrame, packed: DataFrame,
                          cents: DataFrame, k: Int): DataFrame = {
    val passthrough = queries.columns.filterNot(
      Set("vec_id", "embedding")).toSeq
    val qn = queries
      .withColumn("qnrm", VectorOps.norm(col("embedding")))
      .crossJoin(broadcast(cents))
    def ccos(c: Column) =
      VectorOps.dot(col("embedding"), c.getField("cvec")) /
        (col("qnrm") * c.getField("cnrm"))
    val scoredCents = transform(col("cents"),
      c => struct(ccos(c).as("s"), c.getField("cid").as("cid")))
    val best = aggregate(
      scoredCents,
      struct(lit(Double.NegativeInfinity).as("s"), lit(-1L).as("cid")),
      (acc, c) => when(c.getField("s") > acc.getField("s"), c)
        .otherwise(acc))
    val assigned = qn
      .withColumn("qcell", best.getField("cid")).drop("cents")
    val joined = assigned.join(packed, col("qcell") === col("cell"))
    // asymmetric quantized cosine: dequantize the member's codes
    // row-locally (lo + (code+128)*step — see VectorOps.sq8Dequant) and
    // run the same fixed-point dot; dnrm was precomputed at pack time
    def dqArr(c: Column) = transform(c.getField("code"), b =>
      c.getField("lo") + (b.cast("double") + lit(128d)) * c.getField("step"))
    def qcos(c: Column) =
      VectorOps.dot(col("embedding"), dqArr(c)) /
        (col("qnrm") * c.getField("dnrm"))
    val scored0 = transform(
      filter(col("cands"), c => c.getField("vec_id") =!= col("vec_id")),
      c => struct(qcos(c).as("cos"), c.getField("vec_id").as("vid")))
    val scored = transform(scored0,
      s => struct((-s.getField("cos")).as("nc"), s.getField("vid").as("vid"),
        s.getField("cos").as("cos")))
    val top = slice(array_sort(scored), 1, k)
    joined
      .select(passthrough.map(col) ++
        Seq(col("vec_id").as("query_id"), posexplode(top)): _*)
      .select(passthrough.map(col) ++ Seq(col("query_id"),
        col("col.vid").as("vec_id"), col("col.cos").as("cos"),
        (col("pos") + 1).cast("int").as("rank")): _*)
  }

  /** Incremental index refresh: fold a batch of NEWLY-ASSIGNED vectors
    * (rows from [[Similarity.ivfAssign]] against the index's OWN frozen
    * centroid table) into the packed index — union each cell's members
    * and restore the vec_id order the row-local search relies on. A
    * full-outer merge, so both brand-new cells (no base row) and
    * untouched cells (no delta row) come through; the result is
    * bit-identical to repacking the whole corpus against the same
    * centroids (IvfAppendSpec). This is the refresh path a production
    * index runs between coarse-quantizer retrains: one shuffle on the
    * cell id per refresh batch, never a recluster of the corpus.
    */
  def ivfIndexAppend(packed: DataFrame, assigned: DataFrame): DataFrame =
    mergePacked(packed, assigned.groupBy(col("cell"))
      .agg(collect_list(
        struct(col("vec_id"), col("embedding"), col("nrm"))).as("dcands")))

  /** [[ivfIndexAppend]] for the quantized index: quantize the
    * newly-assigned batch (per-vector grids depend on nothing but the
    * vector itself, so the delta's codes are bit-identical to what a full
    * repack would produce) and fold it in with the same full-outer cell
    * merge. The resident int8 artifact gets the same append-only refresh
    * cadence as the float index (Sq8AppendSpec: append ≡ repack; search
    * parity over the appended index).
    */
  def sq8IndexAppend(packed: DataFrame, assigned: DataFrame): DataFrame =
    mergePacked(packed, Similarity.sq8Quantize(assigned)
      .groupBy(col("cell"))
      .agg(collect_list(
        struct(col("vec_id"), col("lo"), col("step"), col("code"),
          col("dnrm"))).as("dcands")))

  /** Full-outer keyed merge of a packed index with a per-cell delta:
    * union each cell's members and restore the vec_id order the
    * row-local search relies on; brand-new cells (no base row) and
    * untouched cells (no delta row) both come through. One shuffle on
    * the cell id — the index partition key — per refresh batch.
    */
  private def mergePacked(packed: DataFrame, delta: DataFrame): DataFrame =
    packed.join(delta, Seq("cell"), "full_outer")
      .select(col("cell"),
        sort_array(when(col("cands").isNull, col("dcands"))
          .when(col("dcands").isNull, col("cands"))
          .otherwise(concat(col("cands"), col("dcands")))).as("cands"))

  /** Top-k cosine neighbors per query against the packed index, probing
    * the query's `nProbe` nearest cells — STILL stateless: the probe
    * cells come out of the same row-local centroid scoring (top-nProbe
    * slice instead of argmax), and each probe is its own stream-static
    * equi-join adding one more packed cell row per query, concatenated
    * row-locally before the single score/sort/slice. nProbe joins instead
    * of a per-query explode + windowed re-aggregation keeps the plan free
    * of stateful operators, which is the point of the packed layout.
    * Ranking ties and probe-selection ties are the batch
    * [[Similarity.ivfTopKProbed]] orders, so stream ≡ batch bit-for-bit
    * (SimStreamProbedSpec); nProbe=1 reproduces [[topKAgainstIvfIndex]].
    */
  def topKAgainstIvfIndexProbed(queries: DataFrame, packed: DataFrame,
                                cents: DataFrame, k: Int,
                                nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val passthrough = queries.columns.filterNot(
      Set("vec_id", "embedding")).toSeq
    val qn = queries
      .withColumn("qnrm", VectorOps.norm(col("embedding")))
      .crossJoin(broadcast(cents))
    def ccos(c: Column) =
      VectorOps.dot(col("embedding"), c.getField("cvec")) /
        (col("qnrm") * c.getField("cnrm"))
    // top-nProbe cells row-locally: score once per centroid (two-pass, as
    // in the argmax), sort by (−ccos, cid) — the batch probe ranking —
    // and slice. Missing cells (beyond the distinct assigned set) simply
    // fail their probe join below.
    val scoredCents = transform(col("cents"),
      c => struct(ccos(c).as("s"), c.getField("cid").as("cid")))
    val probeCells = transform(
      slice(array_sort(transform(scoredCents,
        s => struct((-s.getField("s")).as("ns"), s.getField("cid").as("cid")))),
        1, nProbe),
      x => x.getField("cid"))
    val assigned = qn.withColumn("pcells", probeCells).drop("cents")
    // one LEFT equi-join per probe: a probe whose cell has no packed row
    // (possible when nProbe exceeds the occupied-cell count) contributes
    // null, filtered out of the row-local concat. `get` (0-based) rather
    // than `element_at`: when nProbe exceeds the CENTROID count, pcells
    // is shorter than nProbe, and under ANSI mode (Spark 4 default)
    // element_at throws on the out-of-bounds slot where get yields null —
    // a null probe key matches nothing, which is the wanted semantics
    val joined = (0 until nProbe).foldLeft(assigned) { (df, i) =>
      df.join(packed.select(col("cell").as(s"cell$i"),
          col("cands").as(s"cands$i")),
        get(col("pcells"), lit(i)) === col(s"cell$i"), "left_outer")
        .drop(s"cell$i")
    }
    val allCands = flatten(filter(
      array((0 until nProbe).map(i => col(s"cands$i")): _*),
      a => a.isNotNull))
    def qcos(c: Column) =
      VectorOps.dot(col("embedding"), c.getField("embedding")) /
        (col("qnrm") * c.getField("nrm"))
    val scored0 = transform(
      filter(allCands, c => c.getField("vec_id") =!= col("vec_id")),
      c => struct(qcos(c).as("cos"), c.getField("vec_id").as("vid")))
    val scored = transform(scored0,
      s => struct((-s.getField("cos")).as("nc"), s.getField("vid").as("vid"),
        s.getField("cos").as("cos")))
    val top = slice(array_sort(scored), 1, k)
    joined
      .select(passthrough.map(col) ++
        Seq(col("vec_id").as("query_id"), posexplode(top)): _*)
      .select(passthrough.map(col) ++ Seq(col("query_id"),
        col("col.vid").as("vec_id"), col("col.cos").as("cos"),
        (col("pos") + 1).cast("int").as("rank")): _*)
  }

  /** Top-k cosine neighbors per query against the packed index.
    *
    * @param queries streaming frame (vec_id, embedding) — extra columns
    *                (e.g. an event time) pass through untouched
    * @return one row per (query, neighbor): (query_id, vec_id, cos, rank)
    *         plus the query's passthrough columns
    */
  def topKAgainstIvfIndex(queries: DataFrame, packed: DataFrame,
                          cents: DataFrame, k: Int): DataFrame = {
    val passthrough = queries.columns.filterNot(
      Set("vec_id", "embedding")).toSeq
    val qn = queries
      .withColumn("qnrm", VectorOps.norm(col("embedding")))
      .crossJoin(broadcast(cents))
    def ccos(c: Column) =
      VectorOps.dot(col("embedding"), c.getField("cvec")) /
        (col("qnrm") * c.getField("cnrm"))
    // row-local centroid argmax over the cid-ORDERED array: the
    // strictly-greater fold keeps the smallest cid on ties — exactly the
    // batch window's (ccos DESC, cid ASC) row_number() = 1. Two passes:
    // Catalyst does not CSE inside lambda bodies, so scoring in its own
    // transform() first means each centroid pays the O(dim) dot kernel
    // ONCE (a fold comparing ccos(c) inline would evaluate it twice per
    // step — measured ~2× on the kernel-bound portion)
    val scoredCents = transform(col("cents"),
      c => struct(ccos(c).as("s"), c.getField("cid").as("cid")))
    val best = aggregate(
      scoredCents,
      struct(lit(Double.NegativeInfinity).as("s"), lit(-1L).as("cid")),
      (acc, c) => when(c.getField("s") > acc.getField("s"), c)
        .otherwise(acc))
    val assigned = qn
      .withColumn("qcell", best.getField("cid")).drop("cents")
    val joined = assigned.join(packed, col("qcell") === col("cell"))
    def qcos(c: Column) =
      VectorOps.dot(col("embedding"), c.getField("embedding")) /
        (col("qnrm") * c.getField("nrm"))
    // score the cell's members (self excluded), then sort by the struct
    // (−cos, vec_id) — ascending struct order = cos DESC, vec_id ASC, the
    // batch ranking order — and keep the first k. Same two-pass shape as
    // the centroid argmax: score once per candidate, then a second
    // transform derives the sort key from the already-computed cosine
    // (inlining qcos twice in one struct would run the dot kernel twice)
    val scored0 = transform(
      filter(col("cands"), c => c.getField("vec_id") =!= col("vec_id")),
      c => struct(qcos(c).as("cos"), c.getField("vec_id").as("vid")))
    val scored = transform(scored0,
      s => struct((-s.getField("cos")).as("nc"), s.getField("vid").as("vid"),
        s.getField("cos").as("cos")))
    val top = slice(array_sort(scored), 1, k)
    joined
      .select(passthrough.map(col) ++
        Seq(col("vec_id").as("query_id"), posexplode(top)): _*)
      .select(passthrough.map(col) ++ Seq(col("query_id"),
        col("col.vid").as("vec_id"), col("col.cos").as("cos"),
        (col("pos") + 1).cast("int").as("rank")): _*)
  }
}
