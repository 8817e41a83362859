package graft.pipeline

import java.math.{BigDecimal => JBD, RoundingMode => RM}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Exact

/** Trainable quality classifier — the fastText/logreg-style learned
  * quality filter every production corpus pipeline eventually grows
  * (Joulin et al. 2016's shape: hashed bag-of-ngram features into a
  * linear model): hashed unigram counts ([[TextOps.hashFeatures]]'
  * md5-bucket convention) plus a bias feed a logistic regression trained
  * by deterministic FULL-BATCH gradient ascent on the sum log-likelihood,
  * then the corpus is scored row-locally against the learned weights.
  *
  * The demo label distills Gopher's word-count rule (`n_words >=
  * minWords` — Rae et al. 2021 §A.1.1's first filter) into the learned
  * model: the weak-supervision pattern where a heuristic labels the
  * training set and the classifier generalizes it. Any 0/1 label column
  * works; the label is a parameter of the featurization, not of the
  * trainer.
  *
  * TRAINING follows the engine's materialized-rounds idiom (the Lloyd /
  * PCA-ladder harness): the weight vector is MODEL STATE — dim+2 exact
  * decimals, bounded by the feature dimension, never the corpus —
  * collected per round and fed to the next round as literals. Each round
  * is ONE distributed job over the pinned featurized corpus: per-doc
  * margin, sigmoid, and error are row-local against the literal weights
  * (the sparse feature vector lives in the row, so the dot product never
  * shuffles), and the gradient reduces in a SINGLE STAGE with no
  * exchange at all — partition-local exact-decimal partials combined on
  * the driver, the Pca-ladder treeAggregate shape, with the weights in
  * the task closure so the plan (and its generated code) is identical
  * across rounds. SCORING is one corpus scan with
  * zero shuffle and zero joins — the weights ride in as literals, the
  * strongest form of "broadcast".
  *
  * Determinism: the weight-update chain is EXACT DECIMAL end to end —
  * gradients stay DECIMAL(28,10) (never lowered to double), the update
  * `w ← w + round9(lr·g)` is BigDecimal arithmetic on the driver and
  * native decimal arithmetic in the DuckDB mirror (both HALF_UP, both
  * exact, so even exact .5e-9 boundaries agree — a double-space re-round
  * of grid values here is exactly where engines diverge; the r14 first
  * cut lost one weight to it). SUM-gradient (not mean) keeps the chain
  * division-free: decimal division semantics differ across engines, so
  * the per-corpus-size normalization lives in `lr` instead. Doubles
  * appear only where values are either ON the 9dp grid (margins — safe:
  * grid points round to themselves) or generic (the sigmoid, rounded to
  * 9dp immediately — the established `-ln` parity convention from
  * [[Dsir]]).
  */
object Classifier {

  private val Dec = DecimalType(28, 10)

  /** row-local exact-decimal fold of an array of (already round9'd)
    * double terms — matches [[Exact.dsum]] over the same terms
    */
  private def dfold(terms: Column): Column =
    aggregate(terms, lit(0).cast(Dec),
      (acc, t) => (acc + t.cast(Dec)).cast(Dec)).cast("double")

  /** Featurized corpus: (doc_id, label, fs) where `fs` is the per-doc
    * sparse LOG-TF hashed-unigram vector (bucket-sorted, `x =
    * round9(ln(1 + count / n_words))` — the classic sublinear TF
    * transform; raw counts make full-batch GD oscillate) with two
    * pseudo-buckets appended: the log document-length feature
    * `round9(ln(1 + n_words))` at bucket `dim` (fastText's standard extra
    * scalar feature) and the BIAS (x = 1) at `dim + 1` — so one fold
    * covers the whole affine margin. `label` distills the word-count
    * rule. Weight vector length is therefore dim + 2.
    *
    * The log transforms are also the determinism hedge: `ln` of a
    * rational > 1 is irrational, so every feature value has generic
    * trailing digits and its 9dp-grid products with the weights never sit
    * on a round9 midpoint. The r14 second cut used `count / n_words` and
    * `n_words / 100` directly — SHORT terminating decimals whose products
    * with 9dp weights land on exact midpoints at ~1% per term, where the
    * engines' double roundings disagree; four score rows and one weight
    * diverged at sf0.01.
    */
  private def featurized(docs: DataFrame, dim: Int,
                         minWords: Int): DataFrame =
    featurizedOn(TextOps.hashFeaturePairs(docs, dim), dim, minWords)

  /** [[featurized]] with the hashed word-bigram channel (fastText parity
    * — Joulin et al. 2016): content buckets are `dimUni` unigram +
    * `dimBi` bigram (offset by dimUni), then the log-length feature and
    * the bias. Weight vector length is dimUni + dimBi + 2.
    */
  private def featurizedBi(docs: DataFrame, dimUni: Int, dimBi: Int,
                           minWords: Int): DataFrame =
    featurizedOn(TextOps.hashFeaturePairsBi(docs, dimUni, dimBi),
      dimUni + dimBi, minWords)

  /** the shared affine tail over any sparse (bucket, n) channel set:
    * log-TF transform of the content counts, log-length at bucket
    * `nContent`, bias at `nContent + 1`
    */
  private def featurizedOn(pairs: DataFrame, nContent: Int,
                           minWords: Int): DataFrame = {
    val nw = size(col("w")).cast("double")
    pairs
      .select(col("doc_id"),
        when(size(col("w")) >= minWords, 1.0).otherwise(0.0).as("label"),
        concat(
          transform(col("fs"), f =>
            struct(f.getField("bucket").as("bucket"),
              round(log(lit(1.0) +
                f.getField("n").cast("double") / nw), 9).as("x"))),
          array(
            struct(lit(nContent.toLong).as("bucket"),
              round(log(lit(1.0) + nw), 9).as("x")),
            struct(lit(nContent + 1L).as("bucket"), lit(1.0).as("x"))))
          .as("fs"))
  }

  /** per-doc margin `z = Σ_f round9(x_f · w_{bucket_f})` (bias included —
    * the last literal weight is the bias), exact-decimal fold. Every term
    * is a 9dp-grid × 9dp-grid product — an exact 18-digit decimal, so a
    * round9 midpoint needs nine exact trailing digits of 500000000: the
    * same measure-zero boundary class as the engine's other rounded
    * products (e.g. the PCA ladder's `round(cx·v, 9)`).
    */
  private def margin(w: Array[Double]): Column = {
    val wl = typedLit(w.toSeq)
    dfold(transform(col("fs"), f =>
      round(f.getField("x") *
        element_at(wl, f.getField("bucket").cast("int") + 1), 9)))
  }

  /** `round9(σ(z))` — the one transcendental, rounded immediately */
  private def sigmoid9(z: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-z)), 9)

  /** One gradient round as a SINGLE-STAGE distributed reduction (the
    * [[Pca.deflationLadder]] treeAggregate shape): each partition folds
    * its documents into dim+2 exact-decimal gradient partials — margin,
    * sigmoid, and error computed with closure-local mirrors of the
    * engine's round9/DECIMAL(28,10) lowering — and the driver combines
    * the partials exactly. Bit-identical to the declarative
    * explode/groupBy form it replaces, but one stage per round with NO
    * exchange and NO per-round Janino compile (the literal weight vector
    * lives in the task closure, not the plan, so the plan is
    * byte-identical across rounds).
    *
    * HOT-LOOP LOWERING (r16): the r15 inner loop paid ~6 BigDecimal
    * allocations per feature per round (`BigDecimal.valueOf` walks
    * `Double.toString`); at 10 rounds × corpus-features that constant
    * factor was the whole trainer bill, and one driver-box run showed it
    * 6.5× inflated under JIT pressure. The rewrite keeps the EXACT same
    * decimal chain but pays BigDecimal only on a measure-zero fallback:
    *
    *   - every dec10(r9(·)) term is on the 1e-10 grid, so partials
    *     accumulate in a LONG of 1e-10 units — exact integer addition,
    *     identical sums (spilled into a BigDecimal side-accumulator long
    *     before overflow);
    *   - r9 (decimal HALF_UP at 9dp of the double's shortest decimal
    *     repr) is decided in pure double arithmetic when the scaled
    *     fraction sits farther from the .5 midpoint than the provable
    *     error bound (|x|<100 ⇒ |fl(x·1e9) − shortest(x)·1e9| <
    *     2.3e-5 ≪ the 1e-4 guard band); inside the band — or for big,
    *     non-finite, or otherwise odd inputs — it falls back to the
    *     BigDecimal form, so every result is bit-identical by
    *     construction (ClassifierSpec's pure-Scala reference trainer
    *     pins this);
    *   - the featurized rows arrive as PRIMITIVE arrays
    *     (`Array[Int]`/`Array[Double]` encoders read UnsafeArrayData
    *     directly), not `Seq[(Long, Double)]` — no per-feature tuple
    *     boxing on the 10 replays of the pinned corpus.
    */
  private def gradientPartials(feats: DataFrame,
                               w: Array[Double]): DataFrame = {
    val s = feats.sparkSession
    import s.implicits._
    val wv: Array[Double] = w.clone()
    val n = w.length
    feats.select(col("label"),
        col("fs.bucket").cast("array<int>").as("bs"),
        col("fs.x").as("xs"))
      .as[(Double, Array[Int], Array[Double])]
      .mapPartitions { it =>
        import java.math.{BigDecimal => B, RoundingMode => RM}
        def slowR9(x: Double): Double =
          if (x.isNaN || x.isInfinite) x
          else B.valueOf(x).setScale(9, RM.HALF_UP).doubleValue
        // fast path: |x| < 100 bounds the binary-vs-shortest-decimal
        // error of x·1e9 under ~3e-5 (half-ulp of the product just
        // under 1e11 ≈ 1.53e-5, plus the shortest-repr half-ulp of x
        // scaled by 1e9 ≈ 1.42e-5); a 1e-4 dead band around the .5
        // midpoint then guarantees the double decision equals the
        // BigDecimal one (NaN/Inf fail the bound check → slow path)
        def r9(x: Double): Double = {
          val p = x * 1e9
          val a = math.abs(p)
          if (a < 1e11) {
            val fl = math.floor(a)
            val f = a - fl
            if (f > 0.5001 || f < 0.4999) {
              val r = if (f >= 0.5) fl + 1.0 else fl
              (if (x < 0) -r else r) / 1e9
            } else slowR9(x)
          } else slowR9(x)
        }
        // exact dec10 of a value already ON the 9dp grid (r9 output):
        // the shortest decimal repr of such a double IS the grid point
        def dec10(x: Double): B = B.valueOf(x).setScale(10, RM.HALF_UP)
        val accL = new Array[Long](n)
        val accB = Array.fill[B](n)(B.ZERO)
        def spill(i: Int): Unit = {
          accB(i) = accB(i).add(B.valueOf(accL(i), 10))
          accL(i) = 0L
        }
        it.foreach { case (label, bs, xs) =>
          // per-doc margin, scale-10 long + BigDecimal overflow side;
          // a term enters the long path only when |t·1e10| < 1e15
          // (|t| < 1e5), where the double error of t·1e10 is provably
          // < ~0.28 of a scale-10 unit (half-ulp of the product just
          // under 2^50 ≈ 0.0625, plus t's own grid-repr half-ulp
          // scaled by 1e10) ≪ 0.5, so Math.round recovers the exact
          // grid unit count; anything larger goes through dec10 —
          // bit-exact by construction at every magnitude
          var zL = 0L
          var zB = B.ZERO
          var zBig = false
          var i = 0
          val m = bs.length
          while (i < m) {
            val t = r9(xs(i) * wv(bs(i)))
            val p = t * 1e10
            if (p < 1.0e15 && p > -1.0e15) {
              if (zL > 900000000000000000L ||
                  zL < -900000000000000000L) {
                zB = zB.add(B.valueOf(zL, 10)); zL = 0L; zBig = true
              }
              zL += Math.round(p)
            } else { zB = zB.add(dec10(t)); zBig = true }
            i += 1
          }
          val zd =
            if (!zBig && zL < (1L << 52) && zL > -(1L << 52)) zL / 1e10
            else B.valueOf(zL, 10).add(zB).doubleValue
          val pr = r9(1.0 / (1.0 + math.exp(-zd)))
          val err = r9(label - pr)
          i = 0
          while (i < m) {
            val b = bs(i)
            val t = r9(err * xs(i))
            val p = t * 1e10
            if (p < 1.0e15 && p > -1.0e15) {
              if (accL(b) > 900000000000000000L ||
                  accL(b) < -900000000000000000L) spill(b)
              accL(b) += Math.round(p)
            } else accB(b) = accB(b).add(dec10(t))
            i += 1
          }
        }
        var i = 0
        while (i < n) { spill(i); i += 1 }
        Iterator.single(accB.map(_.toPlainString).toSeq)
      }.toDF("g")
  }

  private def gradients(feats: DataFrame,
                        w: Array[Double]): Map[Long, JBD] = {
    val partials = gradientPartials(feats, w).collect()
      .map(_.getSeq[String](0))
    (0 until w.length).map { b =>
      b.toLong -> partials.foldLeft(JBD.ZERO)(
        (s, p) => s.add(new JBD(p(b))))
    }.toMap
  }

  /** test probe: the physical plan of one gradient round, un-executed —
    * PlanSpec pins the exchange-free single-stage reduction shape
    */
  private[graft] def gradientPlanProbe(docs: DataFrame, dim: Int,
                                       minWords: Int,
                                       w: Array[Double]): String =
    gradientPartials(featurized(docs, dim, minWords), w)
      .queryExecution.executedPlan.toString()

  /** Trained weight vector (dim+2 exact decimals at scale 9: content
    * buckets, length feature, bias last)
    * after `rounds` full-batch gradient-ascent steps from zero:
    * `w_b ← w_b + round9(lr · g_b)` in exact BigDecimal arithmetic. The
    * featurized corpus is pinned for the run and released before
    * returning (transient scratch — the weights are the durable
    * artifact).
    */
  def trainWeights(docs: DataFrame, dim: Int, rounds: Int, lr: Double,
                   minWords: Int): Array[JBD] =
    trainOn(featurized(docs, dim, minWords), dim + 2, rounds, lr)

  /** the trainer over any featurized frame — the pin is released in a
    * finally so a failed gradient round cannot leak the cached corpus
    */
  private def trainOn(feats0: DataFrame, nWeights: Int, rounds: Int,
                      lr: Double): Array[JBD] = {
    val feats = graft.core.Caches.deferRelease(
      graft.core.Parallel.widen(feats0).persist())
    try trainOnPinned(feats, nWeights, rounds, lr)
    finally graft.core.Caches.release(feats, blocking = true)
  }

  /** trainer core over an ALREADY-PINNED featurized frame — callers that
    * score the same corpus afterwards (the trainScore shape) hand the pin
    * in and keep it for the scoring scan, so the corpus is featurized and
    * cached ONCE per train+score, not once per phase; the pin stays
    * registered with [[graft.core.Caches]] for harness-driven release.
    */
  private def trainOnPinned(feats: DataFrame, nWeights: Int, rounds: Int,
                            lr: Double): Array[JBD] = {
    val lrD = JBD.valueOf(lr)
    require(feats.limit(1).count() > 0,
      "Classifier: empty featurized corpus — cannot train")
    var w = Array.fill(nWeights)(JBD.ZERO.setScale(9))
    for (_ <- 1 to rounds) {
      val g = gradients(feats, w.map(_.doubleValue))
      w = Array.tabulate(nWeights) { b =>
        w(b).add(lrD.multiply(g.getOrElse(b.toLong, JBD.ZERO))
          .setScale(9, RM.HALF_UP))
      }
    }
    w
  }

  /** The learned model as rows — (bucket, weight), length feature at bucket
    * `dim`, bias at `dim + 1`;
    * the artifact a pipeline ships to its scorer fleet.
    */
  def weights(docs: DataFrame, dim: Int, rounds: Int, lr: Double,
              minWords: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    trainWeights(docs, dim, rounds, lr, minWords).zipWithIndex
      .map { case (wt, b) => (b.toLong, wt.doubleValue) }.toSeq
      .toDF("bucket", "weight")
  }

  /** Corpus scored against ALREADY-TRAINED weights: one scan, row-local
    * margin + sigmoid against literal weights — zero shuffle, zero joins,
    * stateless on a stream. Output (doc_id, label, score, keep).
    *
    * CONTRACT — empty docs are EXCLUDED: a document whose text tokenizes
    * to zero words has no feature row (the featurizer keeps `size(w) >
    * 0` only, matching the mirror's `len(w) > 0`), so it appears in
    * neither the scored output nor any keep/drop partition downstream.
    * Pipelines that must account for every input row should union the
    * `size(w) = 0` remainder back explicitly.
    */
  def scoreWith(docs: DataFrame, dim: Int, minWords: Int,
                w: Array[Double]): DataFrame =
    scoreOn(featurized(docs, dim, minWords), w)

  private def scoreOn(feats: DataFrame, w: Array[Double]): DataFrame =
    feats
      .select(col("doc_id"),
        explode(array(struct(col("label"),
          sigmoid9(margin(w)).as("score")))).as("s"))
      .select(col("doc_id"), col("s.label").as("label"),
        col("s.score").as("score"),
        (col("s.score") >= 0.5).as("keep"))

  /** Train + score in one call — the batch gate shape. Inherits
    * [[scoreWith]]'s empty-doc exclusion. The corpus is featurized and
    * pinned ONCE: the gradient rounds replay the pin and the scoring
    * scan reads it too (one corpus featurization per call, not two);
    * the transient pin is released by the harness's releaseTransient.
    */
  def trainScore(docs: DataFrame, dim: Int, rounds: Int, lr: Double,
                 minWords: Int): DataFrame = {
    val feats = graft.core.Caches.deferRelease(graft.core.Parallel
      .widen(featurized(docs, dim, minWords)).persist())
    scoreOn(feats,
      trainOnPinned(feats, dim + 2, rounds, lr).map(_.doubleValue))
  }

  /** HELD-OUT composition — the eval-integrity shape the deployed filter
    * actually ships with: weights trained ONLY on the train side of the
    * deterministic [[Curation.assignSplit]] hash split, the VAL side
    * scored with those frozen weights (so [[calibration]] over this
    * output is a true held-out reliability table, not a training-set
    * readback). Both scoping predicates are row-local hash filters —
    * no membership join anywhere.
    */
  def trainScoreHeldOut(docs: DataFrame, dim: Int, rounds: Int,
                        lr: Double, minWords: Int,
                        valFrac: Double): DataFrame =
    scoreWith(Curation.onSplit(docs, valFrac, "val"), dim, minWords,
      trainWeights(Curation.onSplit(docs, valFrac, "train"), dim, rounds,
        lr, minWords).map(_.doubleValue))

  /** Unigram+bigram model (fastText parity): train + score with the
    * [[featurizedBi]] channel set. Weight length dimUni + dimBi + 2.
    */
  def trainScoreBigram(docs: DataFrame, dimUni: Int, dimBi: Int,
                       rounds: Int, lr: Double, minWords: Int): DataFrame = {
    val feats = graft.core.Caches.deferRelease(graft.core.Parallel
      .widen(featurizedBi(docs, dimUni, dimBi, minWords)).persist())
    scoreOn(feats,
      trainOnPinned(feats, dimUni + dimBi + 2, rounds, lr)
        .map(_.doubleValue))
  }

  /** Trained bigram-channel weight vector (dimUni + dimBi + 2 exact
    * decimals) — the frozen-model counterpart of [[trainWeights]] for
    * the fastText-parity channel set.
    */
  def trainWeightsBigram(docs: DataFrame, dimUni: Int, dimBi: Int,
                         rounds: Int, lr: Double,
                         minWords: Int): Array[JBD] =
    trainOn(featurizedBi(docs, dimUni, dimBi, minWords),
      dimUni + dimBi + 2, rounds, lr)

  /** Bigram-channel corpus scored against ALREADY-TRAINED weights — the
    * frozen-model mirror of [[scoreWith]] over [[featurizedBi]].
    */
  def scoreWithBigram(docs: DataFrame, dimUni: Int, dimBi: Int,
                      minWords: Int, w: Array[Double]): DataFrame =
    scoreOn(featurizedBi(docs, dimUni, dimBi, minWords), w)

  /** The bigram model's learned weights — (bucket, weight); unigram
    * buckets [0, dimUni), bigram [dimUni, dimUni+dimBi), then length
    * and bias.
    */
  def weightsBigram(docs: DataFrame, dimUni: Int, dimBi: Int, rounds: Int,
                    lr: Double, minWords: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    trainWeightsBigram(docs, dimUni, dimBi, rounds, lr, minWords)
      .zipWithIndex
      .map { case (wt, b) => (b.toLong, wt.doubleValue) }.toSeq
      .toDF("bucket", "weight")
  }

  /** Calibration readout over a scored corpus — the reliability-diagram
    * table every deployed quality filter ships with its threshold:
    * scores binned into `bins` equal-width bins, per bin the count, the
    * exact-decimal mean score, and the positive-label fraction. One
    * `bins`-group aggregation over the scoring scan; the bin boundary is
    * the identical IEEE `floor(score · bins)` on both engines.
    */
  def calibration(scored: DataFrame, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    scored
      .withColumn("bin",
        least(floor(col("score") * bins).cast("int"), lit(bins - 1)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        Exact.davg(col("score")).as("mean_score"),
        Exact.davg(col("label")).as("frac_pos"))
  }

  /** Threshold RECALIBRATION scan — the operator the held-out
    * reliability table calls for when it reads the default 0.5 keep
    * threshold as miscalibrated: every bin edge t = k/bins
    * (k ∈ [0, bins]) scored by held-out accuracy under `keep = score ≥
    * t`. Output one row per edge: (edge, threshold, correct, total,
    * acc); the deployment pick is the max-acc row (smallest edge on
    * ties — both orderings deterministic).
    *
    * Scale shape: one bins-group aggregation over the scoring scan
    * (map-side combinable), then cumulative sums over the BINS+1-row
    * edge table — the only ordered pass is over a frame bounded by the
    * bin count, never the corpus. Counts are exact longs; `acc` is the
    * one double division, same op order both engines.
    */
  def thresholdScan(scored: DataFrame, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val s = scored.sparkSession
    import s.implicits._
    // bins+1 buckets: bucket k < bins holds [k/bins, (k+1)/bins), bucket
    // `bins` holds EXACTLY score = 1.0 — without it a 1.0 score was
    // clamped under the top edge and counted as dropped at threshold 1.0
    // even though keep = score >= 1.0 keeps it (r15 advisory; the IEEE
    // floor(score·bins) only reaches `bins` at exactly 1.0, since 9dp
    // scores ≤ 1 − 1e-9 multiply strictly below it)
    val binned = scored
      .withColumn("bin",
        least(floor(col("score") * bins).cast("int"), lit(bins)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("label")).cast("long").as("pos"))
    // dense edge spine (empty bins included) so the cumulative walk is
    // total; bins+1 edges, bin k carries counts of scores in
    // [k/bins, (k+1)/bins)
    val spine = (0 to bins).map(k => k).toDF("edge")
    val w = org.apache.spark.sql.expressions.Window.orderBy("edge")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val t = spine
      .join(binned.withColumnRenamed("bin", "edge"), Seq("edge"), "left")
      .na.fill(0L, Seq("n", "pos"))
      .withColumn("nBelow", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("posBelow", coalesce(sum(col("pos")).over(w), lit(0L)))
    val totals = t.agg(sum(col("n")).as("total"),
      sum(col("pos")).as("totalPos"))
    t.crossJoin(broadcast(totals))
      .select(col("edge"),
        (col("edge").cast("double") / bins).as("threshold"),
        (col("totalPos") - col("posBelow") +
          (col("nBelow") - col("posBelow"))).as("correct"),
        col("total"))
      .withColumn("acc", col("correct").cast("double") /
        col("total").cast("double"))
  }

  /** the deployment pick: max-accuracy edge, smallest edge on ties */
  def bestThreshold(scored: DataFrame, bins: Int): DataFrame =
    thresholdScan(scored, bins)
      .orderBy(col("acc").desc, col("edge").asc)
      .limit(1)

  // ---------------------------------------------------------------- SQL

  private def dsum9(c: String) = Exact.dsumSql(s"ROUND($c, 9)")

  /** weight DECIMAL(28,9) → DOUBLE through the VARCHAR hop (the
    * [[Exact.dsumSql]] convention — matches BigDecimal.doubleValue)
    */
  private def wtDouble(c: String) = s"CAST(CAST($c AS VARCHAR) AS DOUBLE)"

  /** Featurization CTEs `ws$sfx`/`d$sfx`/`tok$sfx`/`f$sfx` over
    * `documents WHERE $pred` — MATERIALIZED where multiply referenced
    * (DuckDB otherwise re-inlines the upstream chain per reference).
    * With `dimBi` set, the hashed word-bigram channel unions in at
    * buckets offset by `dim` (pair text `w[i] || ' ' || w[i+1]`, the
    * Spark twin's concat_ws convention).
    */
  private def featureCtesSql(dim: Int, dimBi: Option[Int], minWords: Int,
                             pred: String, sfx: String): String = {
    val nContent = dim + dimBi.getOrElse(0)
    val bigCte = dimBi.map(_ =>
      s"""
         |big$sfx AS (SELECT doc_id, len(w) AS nw,
         |         w[CAST(t.i AS INTEGER)] || ' ' ||
         |           w[CAST(t.i + 1 AS INTEGER)] AS pair
         |       FROM ws$sfx, unnest(range(1, len(w))) AS t(i)),"""
        .stripMargin).getOrElse("")
    val biBranch = dimBi.map(db =>
      s"""
         |  UNION ALL
         |  SELECT doc_id,
         |         $dim + CAST('0x' || substr(md5(pair), 1, 8) AS BIGINT)
         |           % $db AS bucket,
         |         ROUND(ln(CAST(1 AS DOUBLE) +
         |           CAST(COUNT(*) AS DOUBLE) / CAST(nw AS DOUBLE)), 9)
         |           AS x
         |  FROM big$sfx GROUP BY doc_id, 2, nw""".stripMargin)
      .getOrElse("")
    s"""ws$sfx AS (SELECT doc_id,
       |         list_filter(string_split(trim(text), ' '),
       |                     x -> x <> '') AS w
       |       FROM documents WHERE $pred),
       |d$sfx AS MATERIALIZED (SELECT doc_id, CAST(len(w) AS BIGINT) AS nw,
       |       CAST(CASE WHEN len(w) >= $minWords THEN 1 ELSE 0 END
       |            AS DOUBLE) AS label
       |     FROM ws$sfx WHERE len(w) > 0),
       |tok$sfx AS (SELECT doc_id, len(w) AS nw, s AS word
       |        FROM ws$sfx, unnest(w) AS t(s)),$bigCte
       |f$sfx AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST('0x' || substr(md5(word), 1, 8) AS BIGINT) % $dim
       |           AS bucket,
       |         ROUND(ln(CAST(1 AS DOUBLE) +
       |           CAST(COUNT(*) AS DOUBLE) / CAST(nw AS DOUBLE)), 9)
       |           AS x
       |  FROM tok$sfx GROUP BY doc_id, 2, nw$biBranch
       |  UNION ALL
       |  SELECT doc_id, $nContent AS bucket,
       |         ROUND(ln(CAST(1 AS DOUBLE) + CAST(nw AS DOUBLE)), 9)
       |           AS x
       |  FROM d$sfx
       |  UNION ALL
       |  SELECT doc_id, ${nContent + 1} AS bucket, CAST(1 AS DOUBLE) AS x
       |  FROM d$sfx)""".stripMargin
  }

  /** The unrolled gradient rounds over the unsuffixed feature CTEs —
    * round r's weights land in `w$r` as DECIMAL(28,9), updated in native
    * decimal arithmetic (exact, like the driver's BigDecimal chain).
    */
  private def roundsSql(nWeights: Int, rounds: Int, lr: Double): String = {
    val w0 =
      s"""w0 AS (SELECT CAST(r.i AS BIGINT) AS bucket,
         |              CAST(0 AS DECIMAL(28,9)) AS wt
         |       FROM range(0, $nWeights) r(i))""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""z$r AS (SELECT f.doc_id, ${dsum9(s"f.x * ${wtDouble("w.wt")}")} AS z
         |      FROM f JOIN w${r - 1} w USING (bucket) GROUP BY 1),
         |e$r AS (SELECT d.doc_id,
         |         ROUND(d.label - ROUND(1.0/(1.0 + exp(-z$r.z)), 9), 9)
         |           AS err
         |       FROM d JOIN z$r USING (doc_id)),
         |g$r AS (SELECT f.bucket,
         |         SUM(CAST(ROUND(e$r.err * f.x, 9) AS DECIMAL(28,10)))
         |           AS g
         |      FROM f JOIN e$r USING (doc_id) GROUP BY 1),
         |w$r AS MATERIALIZED (SELECT w.bucket,
         |         CAST(w.wt + ROUND(CAST($lr AS DECIMAL(10,8)) *
         |           COALESCE(g$r.g, CAST(0 AS DECIMAL(28,10))), 9)
         |           AS DECIMAL(28,9)) AS wt
         |       FROM w${r - 1} w LEFT JOIN g$r USING (bucket))"""
        .stripMargin
    }.mkString(",\n")
    s"$w0,\n$steps"
  }

  /** Shared CTE ladder: featurization + unrolled rounds (unigram). */
  private def ladderSql(dim: Int, rounds: Int, lr: Double,
                        minWords: Int): String =
    s"${featureCtesSql(dim, None, minWords, "TRUE", "")},\n" +
      roundsSql(dim + 2, rounds, lr)

  /** [[ladderSql]] with the bigram channel. */
  private def ladderBiSql(dim: Int, dimBi: Int, rounds: Int, lr: Double,
                          minWords: Int): String =
    s"${featureCtesSql(dim, Some(dimBi), minWords, "TRUE", "")},\n" +
      roundsSql(dim + dimBi + 2, rounds, lr)

  /** DuckDB mirror of [[weights]]. */
  def weightsSql(dim: Int, rounds: Int, lr: Double,
                 minWords: Int): String =
    s"""WITH ${ladderSql(dim, rounds, lr, minWords)}
       |SELECT bucket, ${wtDouble("wt")} AS weight
       |FROM w$rounds ORDER BY bucket""".stripMargin

  /** the train ladder extended to the scored corpus CTE `sc` */
  private def scoredSql(dim: Int, rounds: Int, lr: Double,
                        minWords: Int): String =
    s"""${ladderSql(dim, rounds, lr, minWords)},
       |zf AS (SELECT f.doc_id, ${dsum9(s"f.x * ${wtDouble("w.wt")}")} AS z
       |       FROM f JOIN w$rounds w USING (bucket) GROUP BY 1),
       |sc AS (SELECT d.doc_id, d.label,
       |         ROUND(1.0/(1.0 + exp(-zf.z)), 9) AS score
       |       FROM d JOIN zf USING (doc_id))""".stripMargin

  /** DuckDB mirror of [[trainScore]] (and of the streaming twin — the
    * scorer is stateless, so the replayed slice scores identically).
    */
  def trainScoreSql(dim: Int, rounds: Int, lr: Double,
                    minWords: Int): String =
    s"""WITH ${scoredSql(dim, rounds, lr, minWords)}
       |SELECT doc_id, label, score, score >= 0.5 AS keep
       |FROM sc ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of [[trainScore]] ∘ [[calibration]]. */
  def calibrationSql(dim: Int, rounds: Int, lr: Double, minWords: Int,
                     bins: Int): String =
    s"""WITH ${scoredSql(dim, rounds, lr, minWords)}
       |SELECT LEAST(CAST(FLOOR(score * $bins) AS INTEGER), ${bins - 1})
       |         AS bin,
       |       COUNT(*) AS n,
       |       ${Exact.davgSql("score")} AS mean_score,
       |       ${Exact.davgSql("label")} AS frac_pos
       |FROM sc GROUP BY 1 ORDER BY bin""".stripMargin

  /** train ladder over the TRAIN split + val-side featurization (`fv`,
    * `dv`) + scoring CTE `sc` over val docs against the frozen `w$rounds`
    */
  private def heldOutScoredSql(dim: Int, rounds: Int, lr: Double,
                               minWords: Int, valFrac: Double): String = {
    val trainPred = Curation.onSplitPredSql("doc_id", valFrac, "train")
    val valPred = Curation.onSplitPredSql("doc_id", valFrac, "val")
    s"""${featureCtesSql(dim, None, minWords, trainPred, "")},
       |${roundsSql(dim + 2, rounds, lr)},
       |${featureCtesSql(dim, None, minWords, valPred, "v")},
       |zf AS (SELECT fv.doc_id, ${dsum9(s"fv.x * ${wtDouble("w.wt")}")} AS z
       |       FROM fv JOIN w$rounds w USING (bucket) GROUP BY 1),
       |sc AS (SELECT dv.doc_id, dv.label,
       |         ROUND(1.0/(1.0 + exp(-zf.z)), 9) AS score
       |       FROM dv JOIN zf USING (doc_id))""".stripMargin
  }

  /** DuckDB mirror of [[trainScoreHeldOut]]. */
  def heldOutScoreSql(dim: Int, rounds: Int, lr: Double, minWords: Int,
                      valFrac: Double): String =
    s"""WITH ${heldOutScoredSql(dim, rounds, lr, minWords, valFrac)}
       |SELECT doc_id, label, score, score >= 0.5 AS keep
       |FROM sc ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of [[trainScoreHeldOut]] ∘ [[calibration]] — the
    * held-out reliability table.
    */
  def heldOutCalibrationSql(dim: Int, rounds: Int, lr: Double,
                            minWords: Int, valFrac: Double,
                            bins: Int): String =
    s"""WITH ${heldOutScoredSql(dim, rounds, lr, minWords, valFrac)}
       |SELECT LEAST(CAST(FLOOR(score * $bins) AS INTEGER), ${bins - 1})
       |         AS bin,
       |       COUNT(*) AS n,
       |       ${Exact.davgSql("score")} AS mean_score,
       |       ${Exact.davgSql("label")} AS frac_pos
       |FROM sc GROUP BY 1 ORDER BY bin""".stripMargin

  /** threshold-scan CTEs over the scored CTE `sc` → result set
    * (edge, threshold, correct, total, acc), unordered
    */
  private def thresholdScanSql(bins: Int): String =
    s"""b AS (SELECT LEAST(CAST(FLOOR(score * $bins) AS INTEGER),
       |               $bins) AS bin,
       |             COUNT(*) AS n, CAST(SUM(label) AS BIGINT) AS pos
       |      FROM sc GROUP BY 1),
       |e AS (SELECT CAST(r.i AS INTEGER) AS edge
       |      FROM range(0, ${bins + 1}) r(i)),
       |t AS (SELECT e.edge, COALESCE(b.n, 0) AS n,
       |             COALESCE(b.pos, 0) AS pos
       |      FROM e LEFT JOIN b ON b.bin = e.edge),
       |cw AS (SELECT edge,
       |        COALESCE(SUM(n) OVER (ORDER BY edge ROWS BETWEEN
       |          UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nBelow,
       |        COALESCE(SUM(pos) OVER (ORDER BY edge ROWS BETWEEN
       |          UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS posBelow
       |       FROM t),
       |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
       |               CAST(SUM(pos) AS BIGINT) AS totalPos FROM t),
       |scan AS (SELECT cw.edge AS edge,
       |          CAST(cw.edge AS DOUBLE) / $bins AS threshold,
       |          CAST(tot.totalPos - cw.posBelow +
       |            (cw.nBelow - cw.posBelow) AS BIGINT) AS correct,
       |          tot.total AS total,
       |          CAST(tot.totalPos - cw.posBelow +
       |            (cw.nBelow - cw.posBelow) AS DOUBLE) /
       |            CAST(tot.total AS DOUBLE) AS acc
       |        FROM cw CROSS JOIN tot)""".stripMargin

  /** DuckDB mirror of [[trainScoreHeldOut]] ∘ [[thresholdScan]]. */
  def heldOutThresholdScanSql(dim: Int, rounds: Int, lr: Double,
                              minWords: Int, valFrac: Double,
                              bins: Int): String =
    s"""WITH ${heldOutScoredSql(dim, rounds, lr, minWords, valFrac)},
       |${thresholdScanSql(bins)}
       |SELECT edge, threshold, correct, total, acc
       |FROM scan ORDER BY edge""".stripMargin

  /** DuckDB mirror of [[trainScoreHeldOut]] ∘ [[bestThreshold]]. */
  def heldOutBestThresholdSql(dim: Int, rounds: Int, lr: Double,
                              minWords: Int, valFrac: Double,
                              bins: Int): String =
    s"""WITH ${heldOutScoredSql(dim, rounds, lr, minWords, valFrac)},
       |${thresholdScanSql(bins)}
       |SELECT edge, threshold, correct, total, acc
       |FROM scan ORDER BY acc DESC, edge LIMIT 1""".stripMargin

  /** the bigram ladder extended to the scored corpus CTE `sc` */
  private def scoredBiSql(dim: Int, dimBi: Int, rounds: Int, lr: Double,
                          minWords: Int): String =
    s"""${ladderBiSql(dim, dimBi, rounds, lr, minWords)},
       |zf AS (SELECT f.doc_id, ${dsum9(s"f.x * ${wtDouble("w.wt")}")} AS z
       |       FROM f JOIN w$rounds w USING (bucket) GROUP BY 1),
       |sc AS (SELECT d.doc_id, d.label,
       |         ROUND(1.0/(1.0 + exp(-zf.z)), 9) AS score
       |       FROM d JOIN zf USING (doc_id))""".stripMargin

  /** DuckDB mirror of [[trainScoreBigram]]. */
  def trainScoreBigramSql(dim: Int, dimBi: Int, rounds: Int, lr: Double,
                          minWords: Int): String =
    s"""WITH ${scoredBiSql(dim, dimBi, rounds, lr, minWords)}
       |SELECT doc_id, label, score, score >= 0.5 AS keep
       |FROM sc ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of [[weightsBigram]]. */
  def weightsBigramSql(dim: Int, dimBi: Int, rounds: Int, lr: Double,
                       minWords: Int): String =
    s"""WITH ${ladderBiSql(dim, dimBi, rounds, lr, minWords)}
       |SELECT bucket, ${wtDouble("wt")} AS weight
       |FROM w$rounds ORDER BY bucket""".stripMargin
}
