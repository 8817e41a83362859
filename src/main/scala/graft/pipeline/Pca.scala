package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Exact

/** Distributed PCA by power iteration: the top principal direction of
  * the embedding corpus — the whitening/dim-reduction pre-pass an
  * embedding pipeline runs before quantization or projection.
  *
  * `v ← normalize(Σ_i (x_i − m)·⟨x_i − m, v⟩)` from the fixed seed
  * `v₀ = e₀`, a fixed number of iterations. Each iteration is ONE corpus
  * scan: the current direction rides a one-row broadcast, the per-row
  * projection is a row-local fold, and the only shuffle is the
  * dim-bounded per-dimension partial-sum aggregation (dim × partitions
  * rows, regardless of corpus size) — the same shape as
  * [[Similarity.dimStats]]. Nothing materializes a covariance matrix:
  * the matvec `A·v = Xᵀ(X·v)` is two passes fused into one scan.
  *
  * Cross-engine determinism: every sum in the ladder (projection, per-dim
  * accumulation, norm) is an exact DECIMAL(28,10) fold of 9dp-rounded
  * terms — order-free, so Spark's row-local array folds and DuckDB's
  * grouped sums land on identical decimals, lowered to double through
  * the established VARCHAR-hop convention. Centered values, projections,
  * and loadings are all 9dp-rounded at each stage; the fixed seed pins
  * the sign.
  */
object Pca {
  private val Dec = DecimalType(28, 10)

  /** exact-decimal fold of an array of 9dp-rounded double terms */
  private def dfold(terms: Column): Column =
    aggregate(terms, lit(0).cast(Dec),
      (acc, t) => (acc + t.cast(Dec)).cast(Dec)).cast("double")

  /** One-row frame `(m: array<double>)`: per-dimension corpus means via
    * the [[Similarity.dimStats]] arithmetic.
    */
  def meanRow(emb: DataFrame): DataFrame =
    Similarity.dimStats(emb)
      .agg(transform(sort_array(collect_list(
        struct(col("dim"), col("mean")))), x => x.getField("mean"))
        .as("m"))

  /** Per-row centered array `cx_j = round9(x_j − m_j)` against the
    * broadcast mean row.
    */
  private def centered(emb: DataFrame, mRow: DataFrame): DataFrame =
    emb.crossJoin(broadcast(mRow))
      .select(col("vec_id"), transform(col("embedding"), (x, i) =>
        round(x.cast("double") - element_at(col("m"), i + 1), 9))
        .as("cx"))

  /** One power step: current direction (one-row `vs` frame) → next
    * direction frame `(dim, w, v)` where `w` is the un-normalized matvec
    * component and `v` the normalized 9dp loading.
    */
  private def step(cen: DataFrame, vRow: DataFrame): DataFrame = {
    val proj = dfold(zip_with(col("cx"), col("vs"),
      (a, b) => round(a * b, 9)))
    val perDim = cen.crossJoin(broadcast(vRow))
      .withColumn("c", proj)
      .select(col("c"), posexplode(col("cx")).as(Seq("dim", "cxj")))
      .withColumn("t", round(col("c") * col("cxj"), 9))
      .groupBy("dim")
      .agg(Exact.dsum(col("t")).as("w"))
    val nrm = perDim
      .agg(sqrt(Exact.dsum(round(col("w") * col("w"), 9))).as("nrm"))
    perDim.crossJoin(broadcast(nrm))
      .select(col("dim"), col("w"), col("nrm"),
        round(col("w") / col("nrm"), 9).as("v"))
  }

  private def asRow(stepped: DataFrame): DataFrame =
    stepped.agg(transform(sort_array(collect_list(
      struct(col("dim"), col("v")))), x => x.getField("v")).as("vs"))

  /** The top principal direction after `iters` power steps.
    *
    * Output: (dim, loading, eigval) — 64 rows; `eigval` is the final
    * step's ‖A·v‖ (the Rayleigh-quotient estimate under a unit `v`),
    * identical on every row.
    */
  def topComponent(emb: DataFrame, dim: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = emb.sparkSession
    // NOT pinned, measured: the corpus here is small relative to the
    // expression weight, and a per-run InMemoryRelation changes the
    // plan identity, forcing ~100 Janino recompilations per run — the
    // pin cost more than the re-scan it saved (4.0 → 4.4 s at sf0.1).
    // At a scale where the scan dominates, callers can persist `emb`.
    val cen = centered(emb, meanRow(emb))
    val v0 = spark.range(1).select(
      transform(sequence(lit(0), lit(dim - 1)), i =>
        when(i === 0, 1.0).otherwise(0.0)).as("vs"))
    var cur = step(cen, v0)
    for (_ <- 2 to iters) cur = step(cen, asRow(cur))
    cur.select(col("dim"), col("v").as("loading"),
      col("nrm").as("eigval")).orderBy("dim")
  }

  /** The final direction as a broadcastable one-row `(vs)` frame — the
    * frozen artifact an online scorer projects against.
    */
  def topComponentRow(emb: DataFrame, dim: Int, iters: Int): DataFrame =
    asRow(topComponent(emb, dim, iters)
      .select(col("dim"), col("loading").as("v")))

  /** Projection + reconstruction residual of each vector against a
    * frozen (mean, direction) pair — the PCA outlier/compression
    * readout: `proj = ⟨x − m, v⟩`, `resid = √(‖x − m‖² − proj²)`.
    * Row-local against two one-row broadcasts: stateless, zero shuffle,
    * stream-safe. Same exact-decimal/9dp ladder as the trainer.
    *
    * Output: (vec_id, proj, resid).
    */
  def project(emb: DataFrame, mRow: DataFrame,
              vRow: DataFrame): DataFrame = {
    val proj = dfold(zip_with(col("cx"), col("vs"),
      (a, b) => round(a * b, 9)))
    val n2 = dfold(transform(col("cx"), a => round(a * a, 9)))
    centered(emb, mRow)
      .crossJoin(broadcast(vRow))
      .withColumn("proj", proj)
      .withColumn("n2", n2)
      // generator barrier (the Dsir.score lesson): an outlier threshold
      // on resid/proj must not sink into the broadcast join condition,
      // where these folds would re-evaluate interpreted per row
      .select(col("vec_id"), explode(array(struct(col("proj"),
        sqrt(greatest(col("n2") - col("proj") * col("proj"), lit(0.0)))
          .as("resid")))).as("s"))
      .select(col("vec_id"), col("s.proj").as("proj"),
        col("s.resid").as("resid"))
  }

  /** DuckDB mirror of [[topComponent]] over `embeddings` — the power
    * loop unrolled CTE-per-iteration (the Lloyd-oracle pattern), same
    * 9dp/exact-decimal ladder.
    */
  def topComponentSql(dim: Int, iters: Int): String = {
    def dsum9(c: String) = Exact.dsumSql(s"ROUND($c, 9)")
    val mean = s"""mt AS (SELECT i - 1 AS dim,
                  |        ROUND(CAST(embedding[i] AS DOUBLE), 9) AS x
                  |      FROM embeddings, range(1, ${dim + 1}) r(i)),
                  |mm AS (SELECT dim, ${Exact.dsumSql("x")} / COUNT(x) AS m
                  |       FROM mt GROUP BY 1),
                  |cx AS (SELECT e.vec_id, r.i - 1 AS dim,
                  |         ROUND(CAST(e.embedding[r.i] AS DOUBLE) - mm.m, 9)
                  |           AS cx
                  |       FROM embeddings e, range(1, ${dim + 1}) r(i)
                  |       JOIN mm ON mm.dim = r.i - 1),
                  |v0 AS (SELECT i - 1 AS dim,
                  |         CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END AS v
                  |       FROM range(1, ${dim + 1}) r(i))""".stripMargin
    val steps = (1 to iters).map { k =>
      val pv = if (k == 1) "v0" else s"v${k - 1}"
      s"""c$k AS (SELECT cx.vec_id,
         |        ${dsum9(s"cx.cx * $pv.v")} AS c
         |      FROM cx JOIN $pv USING (dim) GROUP BY 1),
         |w$k AS (SELECT cx.dim, ${dsum9(s"c$k.c * cx.cx")} AS w
         |      FROM cx JOIN c$k USING (vec_id) GROUP BY 1),
         |n$k AS (SELECT SQRT(${dsum9("w * w")}) AS nrm FROM w$k),
         |v$k AS (SELECT dim, w, nrm, ROUND(w / nrm, 9) AS v
         |      FROM w$k, n$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH $mean,
       |$steps
       |SELECT dim, v AS loading, nrm AS eigval
       |FROM v$iters ORDER BY dim""".stripMargin
  }

  /** DuckDB mirror of [[project]] against the `iters`-step component of
    * the same corpus (the self-scored gate posture).
    */
  def projectSql(dim: Int, iters: Int): String = {
    def dsum9(c: String) = Exact.dsumSql(s"ROUND($c, 9)")
    val base = topComponentSql(dim, iters)
    val body = base.substring(0, base.indexOf("SELECT dim, v AS loading"))
      .trim + ","
    s"""$body
       |pr AS (SELECT cx.vec_id,
       |         ${dsum9(s"cx.cx * v$iters.v")} AS proj,
       |         ${dsum9("cx.cx * cx.cx")} AS n2
       |       FROM cx JOIN v$iters USING (dim) GROUP BY 1)
       |SELECT vec_id, proj,
       |       SQRT(GREATEST(n2 - proj * proj, 0.0)) AS resid
       |FROM pr ORDER BY vec_id""".stripMargin
  }
}
