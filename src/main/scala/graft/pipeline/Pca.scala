package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Exact

/** Distributed PCA by power iteration with deflation: the top-k principal
  * directions of the embedding corpus — the whitening/dim-reduction
  * pre-pass an embedding pipeline runs before quantization or projection.
  *
  * `v ← normalize(Σ_i (x_i − m)·⟨x_i − m, v⟩)` from the fixed seed
  * `v₀ = e₀`; component c+1 repeats the ladder against the residual
  * corpus `cx ← round9(cx − ⟨cx, v_c⟩·v_c)`. Each step is ONE corpus
  * scan: the current direction is a dim-length literal, the per-row
  * projection is a row-local fold, and the only shuffle is the
  * dim-bounded per-dimension partial-sum aggregation (dim × partitions
  * rows, regardless of corpus size) — the same shape as
  * [[Similarity.dimStats]]. Nothing materializes a covariance matrix:
  * the matvec `A·v = Xᵀ(X·v)` is two passes fused into one scan.
  *
  * Steps are MATERIALIZED driver-side: each step's per-dim sums `w` —
  * dim doubles, bounded by the DIMENSION, never the corpus — are
  * collected as ONE global-aggregation row (norm and loading then follow
  * driver-side through the bit-identical Exact.round9/dsumDriver ladder)
  * and fed into the next step as a literal one-row local relation. This is not a driver-side loop over data (the scan and the
  * per-dim aggregation stay distributed); it converts the r12 nested-
  * broadcast pyramid (each step's direction sub-plan contained every
  * prior step, wall 3.8 s vs task 2.6 s at sf0.1 from sequential nested
  * job latency) into a flat sequence of shape-identical small jobs whose
  * generated code Janino serves from cache. It also enables the exact-
  * fixpoint early exit: a step that reproduces its input direction
  * bit-for-bit makes every later step a provable no-op (w, v, nrm are
  * pure functions of the direction), so skipping them cannot change the
  * result the unrolled oracle computes.
  *
  * Cross-engine determinism: every sum in the ladder (projection, per-dim
  * accumulation, norm) is an exact DECIMAL(28,10) fold of 9dp-rounded
  * terms — order-free, so Spark's row-local array folds and DuckDB's
  * grouped sums land on identical decimals, lowered to double through
  * the established VARCHAR-hop convention. Centered values, projections,
  * deflated residuals, and loadings are all 9dp-rounded at each stage;
  * the fixed seed pins the sign.
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
    * broadcast mean row. The input scan is widened to the session's
    * default parallelism (Parallel.widen — a no-op on realistic
    * many-row-group layouts and on streaming frames): every downstream
    * step folds O(dim) exact decimals per row, and the sf0.1 single-split
    * embeddings file otherwise runs that CPU-bound ladder on a fraction
    * of the machine (r13 diag: task_ms ≈ cpu_ms ≈ 4.3 s over 63 tasks).
    */
  private def centered(emb: DataFrame, mRow: DataFrame): DataFrame =
    graft.core.Parallel.widen(emb).crossJoin(broadcast(mRow))
      .select(col("vec_id"), transform(col("embedding"), (x, i) =>
        round(x.cast("double") - element_at(col("m"), i + 1), 9))
        .as("cx"))

  /** one-row `(name: array<double>)` local relation from driver values */
  private def localRow(df: DataFrame, name: String,
                       v: Seq[Double]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    Seq(v).toDF(name)
  }

  /** One fused power step as a SINGLE-STAGE distributed reduction — the
    * `treeAggregate` shape Spark ML uses for iterative kernels: each
    * partition folds its rows into dim exact-decimal partial sums
    * (emitted as plain decimal strings — partitions × dim values, bounded
    * by the DIMENSION, never the corpus), and the driver combines them
    * and finishes the norm/loading through the bit-identical
    * [[Exact.round9]]/[[Exact.dsumDriver]] ladder (the exact lowering of
    * Spark's `round`-on-double and double→DECIMAL(28,10) cast:
    * `BigDecimal.valueOf` + `setScale(HALF_UP)`).
    *
    * Deflation against the already-frozen components is applied ON THE
    * FLY per row from driver-literal directions — no per-component
    * deflated corpus is materialized or cached (at 100 TB a cached
    * deflated COPY of the corpus per component is exactly the thing to
    * avoid; the trade is an O(c·dim) row-local fold per scan). The
    * arithmetic chain `cx ← round9(cx − p·v)` with `p = Σ round9(cx·v)`
    * is the same exact-decimal sequence the unrolled oracle CTEs compute,
    * so recomputing it per step is bit-identical to reading a cached
    * residual.
    *
    * Why not the declarative crossJoin/agg form (r13 shape): each step
    * there was 2 jobs × 2 stages with a fresh 64-wide aggregate plan —
    * per-step Catalyst analysis + AQE + exchange latency dominated the
    * pair's wall (cpu_ms ≈ 1.3 s·32 vs 4.8 s wall). Here the k×iters
    * sequential rounds each pay one 32-task single-stage job over the
    * cached centered corpus and nothing else.
    */
  private def ladderStep(cen: DataFrame, dim: Int,
                         defl: Seq[Array[Double]],
                         v: Array[Double]): (Array[Double], Double) = {
    val s = cen.sparkSession
    import s.implicits._
    val dv: Array[Array[Double]] = defl.toArray
    val vv: Array[Double] = v.clone()
    val d = dim
    val partials = cen.select(col("cx")).as[Seq[Double]]
      .mapPartitions { it =>
        import java.math.{BigDecimal => JBD, RoundingMode => RM}
        // local mirrors of Exact.round9 / the DECIMAL(28,10) cast — kept
        // closure-local so the task closure captures only arrays
        def r9(x: Double): Double =
          if (x.isNaN || x.isInfinite) x
          else JBD.valueOf(x).setScale(9, RM.HALF_UP).doubleValue
        def dec10(x: Double): JBD = JBD.valueOf(x).setScale(10, RM.HALF_UP)
        val acc = Array.fill(d)(JBD.ZERO)
        it.foreach { xs =>
          var cx = xs.toArray
          var di = 0
          while (di < dv.length) {
            val dir = dv(di)
            var p = JBD.ZERO
            var j = 0
            while (j < d) { p = p.add(dec10(r9(cx(j) * dir(j)))); j += 1 }
            val pd = p.doubleValue
            cx = Array.tabulate(d)(j => r9(cx(j) - pd * dir(j)))
            di += 1
          }
          var c = JBD.ZERO
          var j = 0
          while (j < d) { c = c.add(dec10(r9(cx(j) * vv(j)))); j += 1 }
          val cd = c.doubleValue
          j = 0
          while (j < d) { acc(j) = acc(j).add(dec10(r9(cd * cx(j)))); j += 1 }
        }
        Iterator.single(acc.map(_.toPlainString).toSeq)
      }.collect()
    val w = Array.tabulate(dim) { j =>
      partials.foldLeft(java.math.BigDecimal.ZERO)(
        (s, p) => s.add(new java.math.BigDecimal(p(j)))).doubleValue
    }
    val nrm = math.sqrt(Exact.dsumDriver(w.map(x => Exact.round9(x * x))))
    (w.map(x => Exact.round9(x / nrm)), nrm)
  }

  /** Power loop with exact-fixpoint early exit: stops before `iters` only
    * when a step reproduces its input direction BIT-FOR-BIT — later steps
    * are then pure no-ops, so the fixed-`iters` unrolled oracle still
    * matches. `defl` carries the already-frozen components for on-the-fly
    * deflation inside [[ladderStep]].
    */
  private def powerLoop(cen: DataFrame, dim: Int, iters: Int,
                        defl: Seq[Array[Double]]): (Array[Double], Double) = {
    var v = Array.tabulate(dim)(j => if (j == 0) 1.0 else 0.0)
    var nrm = 0.0
    var it = 0
    var fixed = false
    while (it < iters && !fixed) {
      val (v2, n2) = ladderStep(cen, dim, defl, v)
      fixed = java.util.Arrays.equals(v2, v)
      v = v2; nrm = n2; it += 1
    }
    (v, nrm)
  }

  /** collected per-dimension corpus means (dim doubles) */
  private def meanArray(emb: DataFrame): Seq[Double] = {
    val rows = meanRow(emb).collect()
    val m = if (rows.isEmpty || rows.head.isNullAt(0)) Seq.empty[Double]
            else rows.head.getSeq[Double](0)
    require(m.nonEmpty,
      "Pca: empty embedding corpus — cannot train (no per-dimension mean)")
    m
  }

  /** The top principal direction after `iters` power steps.
    *
    * Output: (dim, loading, eigval) — dim rows; `eigval` is the final
    * executed step's ‖A·v‖ (the Rayleigh-quotient estimate under a unit
    * `v`), identical on every row.
    */
  def topComponent(emb: DataFrame, dim: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = emb.sparkSession
    // Pinned as a TRANSIENT (re-measured after the step-materialization
    // refactor): r12 measured this pin as net-negative, but only because
    // the nested-broadcast pyramid changed plan identity per step anyway;
    // with literal-fed steps the single InMemoryRelation instance keeps
    // every step's plan identical, so the pin saves iters−1 re-centering
    // scans at one codegen cost per RUN, not per step.
    val cen = graft.core.Caches.deferRelease(
      centered(emb, localRow(emb, "m", meanArray(emb))).persist())
    val (v, nrm) = powerLoop(cen, dim, iters, Nil)
    // the loadings are driver-local now: the pin is pure intra-call
    // scratch, and leaving it warm would let canonical equality splice it
    // into a later scoring scan (see Caches.release)
    graft.core.Caches.release(cen, blocking = true)
    import spark.implicits._
    (0 until dim).map(j => (j, v(j), nrm)).toDF("dim", "loading", "eigval")
      .orderBy("dim")
  }

  /** Top-k principal directions by deflation: component c+1 is the power
    * ladder over the residual corpus after removing components 1..c.
    * Still one scan per step; the deflation is row-local against literal
    * directions, so the per-step plan shape is constant across
    * components and k never adds a shuffle.
    *
    * Output: (component, dim, loading, eigval) — k × dim rows,
    * component 1-based in eigenvalue order.
    */
  def topComponents(emb: DataFrame, dim: Int, iters: Int,
                    k: Int): DataFrame = {
    require(iters >= 1 && k >= 1, s"iters/k must be >= 1, got $iters/$k")
    val spark = emb.sparkSession
    val (_, comps) = deflationLadder(emb, dim, iters, k)
    import spark.implicits._
    comps.zipWithIndex.flatMap { case ((v, nrm), i) =>
      (0 until dim).map(j => (i + 1, j, v(j), nrm))
    }.toDF("component", "dim", "loading", "eigval")
      .orderBy("component", "dim")
  }

  /** The shared deflation training core: (mean, per-component (loading
    * vector, eigval)) — all driver-local arrays, so both the trainer
    * readout and the rank-k projection reuse ONE mean job and one ladder.
    * The scratch pins are released before returning (see Caches.release):
    * a downstream scoring scan (projectK's centered corpus is canonically
    * EQUAL to component 1's pinned corpus) must not silently read the
    * warm training cache.
    */
  private def deflationLadder(emb: DataFrame, dim: Int, iters: Int,
                              k: Int): (Seq[Double],
                                        Seq[(Array[Double], Double)]) = {
    val mean = meanArray(emb)
    // ONE pinned corpus for the whole ladder: deflation happens on the fly
    // inside ladderStep from the frozen driver-side components, so no
    // per-component residual copy is ever cached (at 100 TB that copy is
    // the scale hazard, not the extra row-local fold)
    val cen = graft.core.Caches.deferRelease(
      centered(emb, localRow(emb, "m", mean)).persist())
    val comps = (1 to k).foldLeft(
      Vector.empty[(Array[Double], Double)]) { (acc, _) =>
      acc :+ powerLoop(cen, dim, iters, acc.map(_._1))
    }
    graft.core.Caches.release(cen, blocking = true)
    (mean, comps)
  }

  /** The final direction as a broadcastable one-row `(vs)` frame — the
    * frozen artifact an online scorer projects against.
    */
  def topComponentRow(emb: DataFrame, dim: Int, iters: Int): DataFrame =
    topComponent(emb, dim, iters)
      .agg(transform(sort_array(collect_list(
        struct(col("dim"), col("loading")))), x => x.getField("loading"))
        .as("vs"))

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

  /** The deflation-trained model as driver-local arrays — the public
    * seam for callers that FREEZE the ladder as (session, corpus) model
    * state and score against it without retraining per query (the
    * [[graft.entry.StreamQueries]] online-projector posture, and since
    * r20 the batch projection gates' too — training is model
    * provisioning on the corpus refresh cadence, exactly the
    * clsWeights / BPE-merge-table / trained-IVFADC convention).
    * Returns (per-dim mean, per-component (loading vector, eigval)).
    */
  def trainLadder(emb: DataFrame, dim: Int, iters: Int,
                  k: Int): (Seq[Double], Seq[(Array[Double], Double)]) =
    deflationLadder(emb, dim, iters, k)

  /** Rank-k projection + residual against the deflation-trained
    * components: `proj_c = ⟨x − m, v_c⟩` (each against the ORIGINAL
    * centered vector — the standard PCA readout),
    * `resid = √(‖x − m‖² − Σ_c proj_c²)`. Trains [[topComponents]]
    * internally (driver-local loadings), then scores row-locally in one
    * corpus scan — zero shuffle beyond the training ladder.
    *
    * Output: (vec_id, proj_1 … proj_k, resid).
    */
  def projectK(emb: DataFrame, dim: Int, iters: Int, k: Int): DataFrame = {
    val (mean, ladder) = deflationLadder(emb, dim, iters, k)
    projectKFrom(emb, mean, ladder.map(_._1))
  }

  /** [[projectK]]'s scoring half against an ALREADY-TRAINED (mean,
    * components) ladder — one row-local scan, zero training jobs; the
    * arithmetic is the identical exact-decimal/9dp chain, so scoring
    * against a frozen ladder is bit-identical to training inline.
    */
  def projectKFrom(emb: DataFrame, mean: Seq[Double],
                   comps: Seq[Array[Double]]): DataFrame = {
    require(comps.nonEmpty, "projectKFrom: need at least one component")
    val k = comps.size
    val cen = centered(emb, localRow(emb, "m", mean))
    val projs = comps.zipWithIndex.map { case (vc, i) =>
      dfold(zip_with(col("cx"), typedLit(vc.toSeq),
        (a, b) => round(a * b, 9))).as(s"proj_${i + 1}")
    }
    val n2 = dfold(transform(col("cx"), a => round(a * a, 9))).as("n2")
    val ssum = (1 to k).map(i => col(s"s.proj_$i") * col(s"s.proj_$i"))
      .reduce(_ + _)
    // same generator barrier as [[project]]: the folds evaluate once
    cen.select(col("vec_id"),
        explode(array(struct(projs :+ n2: _*))).as("s"))
      .select(col("vec_id") +:
        (1 to k).map(i => col(s"s.proj_$i").as(s"proj_$i")) :+
        sqrt(greatest(col("s.n2") - ssum, lit(0.0))).as("resid"): _*)
  }

  // ---------------------------------------------------------------- SQL

  /** Shared CTE prefix of every oracle: mean, centered corpus (cx1), and
    * the unrolled power ladder with deflation for components 1..k — the
    * single builder both the trainer and projection oracles compose
    * (never string surgery on a finished query). Component c's final
    * direction lands in CTE `v${c}_$iters`; the deflated corpus for
    * component c+1 in `cx${c + 1}`.
    */
  private def ladderSql(dim: Int, iters: Int, k: Int): String = {
    def dsum9(c: String) = Exact.dsumSql(s"ROUND($c, 9)")
    // the multiply-referenced CTEs (each cx$c feeds 2×iters step CTEs +
    // the next deflation; each v carries into 2 consumers) are pinned
    // MATERIALIZED: DuckDB otherwise re-inlines the whole upstream chain
    // per reference, which goes exponential in k×iters (measured: the
    // k=2/iters=3 ladder planned 319 s un-hinted vs sub-second pinned)
    val mean = s"""mt AS (SELECT i - 1 AS dim,
                  |        ROUND(CAST(embedding[i] AS DOUBLE), 9) AS x
                  |      FROM embeddings, range(1, ${dim + 1}) r(i)),
                  |mm AS (SELECT dim, ${Exact.dsumSql("x")} / COUNT(x) AS m
                  |       FROM mt GROUP BY 1),
                  |cx1 AS MATERIALIZED (SELECT e.vec_id, r.i - 1 AS dim,
                  |         ROUND(CAST(e.embedding[r.i] AS DOUBLE) - mm.m, 9)
                  |           AS cx
                  |       FROM embeddings e, range(1, ${dim + 1}) r(i)
                  |       JOIN mm ON mm.dim = r.i - 1),
                  |v0 AS (SELECT i - 1 AS dim,
                  |         CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END AS v
                  |       FROM range(1, ${dim + 1}) r(i))""".stripMargin
    val comps = (1 to k).map { c =>
      val steps = (1 to iters).map { t =>
        val pv = if (t == 1) "v0" else s"v${c}_${t - 1}"
        s"""c${c}_$t AS (SELECT cx$c.vec_id,
           |        ${dsum9(s"cx$c.cx * $pv.v")} AS c
           |      FROM cx$c JOIN $pv USING (dim) GROUP BY 1),
           |w${c}_$t AS (SELECT cx$c.dim, ${dsum9(s"c${c}_$t.c * cx$c.cx")} AS w
           |      FROM cx$c JOIN c${c}_$t USING (vec_id) GROUP BY 1),
           |n${c}_$t AS (SELECT SQRT(${dsum9("w * w")}) AS nrm FROM w${c}_$t),
           |v${c}_$t AS MATERIALIZED (SELECT dim, w, nrm,
           |         ROUND(w / nrm, 9) AS v
           |      FROM w${c}_$t, n${c}_$t)""".stripMargin
      }.mkString(",\n")
      val defl = if (c < k)
        s""",
           |p$c AS (SELECT cx$c.vec_id, ${dsum9(s"cx$c.cx * v${c}_$iters.v")} AS p
           |      FROM cx$c JOIN v${c}_$iters USING (dim) GROUP BY 1),
           |cx${c + 1} AS MATERIALIZED (SELECT cx$c.vec_id, cx$c.dim,
           |         ROUND(cx$c.cx - p$c.p * v${c}_$iters.v, 9) AS cx
           |       FROM cx$c JOIN p$c USING (vec_id)
           |       JOIN v${c}_$iters USING (dim))""".stripMargin
      else ""
      steps + defl
    }.mkString(",\n")
    s"$mean,\n$comps"
  }

  /** DuckDB mirror of [[topComponent]] over `embeddings` — the power
    * loop unrolled CTE-per-iteration (the Lloyd-oracle pattern), same
    * 9dp/exact-decimal ladder.
    */
  def topComponentSql(dim: Int, iters: Int): String =
    s"""WITH ${ladderSql(dim, iters, 1)}
       |SELECT dim, v AS loading, nrm AS eigval
       |FROM v1_$iters ORDER BY dim""".stripMargin

  /** DuckDB mirror of [[topComponents]] — deflation unrolled per
    * component.
    */
  def topComponentsSql(dim: Int, iters: Int, k: Int): String = {
    val parts = (1 to k).map { c =>
      s"""SELECT $c AS component, dim, v AS loading, nrm AS eigval
         |FROM v${c}_$iters""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${ladderSql(dim, iters, k)}
       |$parts
       |ORDER BY component, dim""".stripMargin
  }

  /** DuckDB mirror of [[project]] against the `iters`-step component of
    * the same corpus (the self-scored gate posture).
    */
  def projectSql(dim: Int, iters: Int): String = {
    def dsum9(c: String) = Exact.dsumSql(s"ROUND($c, 9)")
    s"""WITH ${ladderSql(dim, iters, 1)},
       |pr AS (SELECT cx1.vec_id,
       |         ${dsum9(s"cx1.cx * v1_$iters.v")} AS proj,
       |         ${dsum9("cx1.cx * cx1.cx")} AS n2
       |       FROM cx1 JOIN v1_$iters USING (dim) GROUP BY 1)
       |SELECT vec_id, proj,
       |       SQRT(GREATEST(n2 - proj * proj, 0.0)) AS resid
       |FROM pr ORDER BY vec_id""".stripMargin
  }

  /** DuckDB mirror of [[projectK]]: every component's projection against
    * the ORIGINAL centered corpus (cx1), rank-k residual.
    */
  def projectKSql(dim: Int, iters: Int, k: Int): String = {
    def dsum9(c: String) = Exact.dsumSql(s"ROUND($c, 9)")
    val projCtes = (1 to k).map { c =>
      s"""pr$c AS (SELECT cx1.vec_id,
         |         ${dsum9(s"cx1.cx * v${c}_$iters.v")} AS proj
         |       FROM cx1 JOIN v${c}_$iters USING (dim) GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val joins = (1 to k).map(c => s"JOIN pr$c USING (vec_id)").mkString(" ")
    val cols = (1 to k).map(c => s"pr$c.proj AS proj_$c").mkString(", ")
    val ss = (1 to k).map(c => s"pr$c.proj * pr$c.proj").mkString(" + ")
    s"""WITH ${ladderSql(dim, iters, k)},
       |$projCtes,
       |nn AS (SELECT vec_id, ${dsum9("cx * cx")} AS n2
       |       FROM cx1 GROUP BY 1)
       |SELECT nn.vec_id, $cols,
       |       SQRT(GREATEST(nn.n2 - ($ss), 0.0)) AS resid
       |FROM nn $joins ORDER BY nn.vec_id""".stripMargin
  }
}
