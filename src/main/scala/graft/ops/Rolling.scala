package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rolling-window statistics over the series model — the online-anomaly
  * companion to the reference's whole-window aggregations (SURVEY §2.2):
  * each point is scored against the trailing `n`-point distribution of
  * its own series.
  *
  * Plan shape: one shuffle on the series key, then a single
  * partition-local sort feeds every windowed moment (Catalyst computes
  * all frames in one Window operator). Moments run through the
  * decimal-exact sums (Exact's convention) so the rolling mean/variance
  * are order-independent and bit-identical to the SQL mirror.
  */
object Rolling {
  /** Trailing z-score: for each (metric, ts_ms) point, the mean/stddev
    * of the last `n` points of that metric (current included) score the
    * point; |z| > `threshold` flags an anomaly. The first point of a
    * series (a one-point window) has zero variance → NULL z, never
    * flagged.
    *
    * Output: (metric, ts_ms, value, zscore, anomaly).
    */
  def zscore(series: DataFrame, n: Int, threshold: Double): DataFrame = {
    val w = Window.partitionBy("metric").orderBy("ts_ms")
      .rowsBetween(-(n - 1), Window.currentRow)
    val cnt = count(lit(1)).over(w).cast("double")
    val s1 = sum(col("value").cast(DecimalType(28, 10))).over(w)
      .cast("double")
    val s2 = sum((col("value") * col("value")).cast(DecimalType(38, 10)))
      .over(w).cast("double")
    val mean = s1 / cnt
    val varp = greatest(s2 / cnt - pow(s1 / cnt, 2.0), lit(0.0))
    val std = sqrt(varp)
    val z = when(std > 0.0, (col("value") - mean) / std)
    series
      .withColumn("zscore", z)
      .withColumn("anomaly", coalesce(abs(col("zscore")) > threshold,
        lit(false)))
      .select("metric", "ts_ms", "value", "zscore", "anomaly")
  }

  /** Trailing exponentially-weighted moving average with a dyadic decay
    * (α = 1/2) over the last `n` points of each series — the classic
    * monitoring smoother, made cross-engine-exact: point j back carries
    * weight 2^(n-1-j), values are scaled to 1e-7 fixed point, and the
    * weighted sum folds in BIGINT (associative, order-independent), so
    * the final two double divisions are the only floating-point ops and
    * both engines run them in the same order. Series heads shorter than
    * `n` renormalize over the weights actually present (the first point
    * of a series smooths to itself).
    *
    * Plan shape: one shuffle on the series key, one partition-local sort
    * feeding all `n` lag frames in a single Window operator — identical
    * cost to [[zscore]] regardless of `n`.
    *
    * Output: (metric, ts_ms, value, ewma).
    */
  def ewma(series: DataFrame, n: Int): DataFrame = {
    // n ≤ 16 keeps |scaled·2^(n-1)·n| far from BIGINT overflow for any
    // realistic series magnitude (1e11 · 2^15 · 16 ≈ 5e16 ≪ 2^63)
    require(n >= 1 && n <= 16, s"n must be in [1, 16], got $n")
    val w = Window.partitionBy("metric").orderBy("ts_ms")
    val scaled = round(col("value") * 1e7).cast("long")
    val terms = (0 until n).map { j =>
      val lj = if (j == 0) scaled else lag(scaled, j).over(w)
      (lj, 1L << (n - 1 - j))
    }
    val s = terms.map { case (lj, wt) => coalesce(lj * wt, lit(0L)) }
      .reduce(_ + _)
    val wsum = terms.map { case (lj, wt) =>
      when(lj.isNotNull, lit(wt)).otherwise(lit(0L))
    }.reduce(_ + _)
    series
      .withColumn("ewma", s.cast("double") / wsum.cast("double") / 1e7)
      .select("metric", "ts_ms", "value", "ewma")
  }

  /** DuckDB mirror of [[ewma]] over a `series`-shaped relation named
    * `base` (declare it in a WITH prefix).
    */
  def ewmaSql(n: Int): String = {
    require(n >= 1 && n <= 16, s"n must be in [1, 16], got $n")
    val over = "OVER (PARTITION BY metric ORDER BY ts_ms)"
    def lj(j: Int) = if (j == 0) "sc" else s"lag(sc, $j) $over"
    val s = (0 until n).map { j =>
      s"COALESCE(${lj(j)} * ${1L << (n - 1 - j)}, 0)"
    }.mkString(" + ")
    val wsum = (0 until n).map { j =>
      s"CASE WHEN ${lj(j)} IS NOT NULL THEN ${1L << (n - 1 - j)} ELSE 0 END"
    }.mkString(" + ")
    s"""sc AS (SELECT metric, ts_ms, value,
       |           CAST(ROUND(CAST(value AS DOUBLE)*1e7, 0) AS BIGINT) AS sc
       |       FROM base),
       |ew AS (SELECT metric, ts_ms, value,
       |           $s AS s, $wsum AS wsum
       |       FROM sc)
       |SELECT metric, ts_ms, value,
       |       CAST(s AS DOUBLE) / CAST(wsum AS DOUBLE) / 1e7 AS ewma
       |FROM ew""".stripMargin
  }

  /** Trailing-n MAD anomaly score — the robust companion to [[zscore]]:
    * each point is scored as `|v − median| / MAD` over its trailing
    * window, where MAD is the median absolute deviation. Unlike the
    * z-score, a single extreme point cannot inflate the denominator
    * (median and MAD have a 50 % breakdown), so MAD flags survive bursty
    * series that blind the moment-based score.
    *
    * A rolling median is not a windowable aggregate (and the nested
    * MAD median depends on the outer one), so the frame's values are
    * collected per row and both medians are row-local sorted-array
    * picks — O(n log n) per point with n small, zero extra shuffle
    * (same one sort per series as every Rolling operator). The even-
    * count median interpolates `(a+b)/2.0`, identical op order both
    * engines; a zero MAD (≥ half the window equal) yields NULL score,
    * never flagged.
    *
    * Output: (metric, ts_ms, value, mad_score, anomaly).
    */
  def mad(series: DataFrame, n: Int, threshold: Double): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val w = Window.partitionBy("metric").orderBy("ts_ms")
      .rowsBetween(-(n - 1), Window.currentRow)
    def medianOf(sorted: Column, cnt: Column): Column =
      when(cnt % 2 === 1,
        element_at(sorted, ((cnt + 1) / lit(2)).cast("int")))
        .otherwise((element_at(sorted, (cnt / lit(2)).cast("int")) +
          element_at(sorted, (cnt / lit(2)).cast("int") + 1)) / 2.0)
    val lst = collect_list(col("value")).over(w)
    series
      .withColumn("__l", lst)
      .withColumn("__c", size(col("__l")))
      .withColumn("__med", medianOf(array_sort(col("__l")), col("__c")))
      .withColumn("__mad", medianOf(
        array_sort(transform(col("__l"), x => abs(x - col("__med")))),
        col("__c")))
      .withColumn("mad_score",
        when(col("__mad") > 0.0,
          abs(col("value") - col("__med")) / col("__mad")))
      .withColumn("anomaly",
        coalesce(col("mad_score") > threshold, lit(false)))
      .select("metric", "ts_ms", "value", "mad_score", "anomaly")
  }

  /** DuckDB mirror of [[mad]] over a `series`-shaped relation named
    * `base` (declare it in a WITH prefix).
    */
  def madSql(n: Int, threshold: Double): String = {
    val frame = s"OVER (PARTITION BY metric ORDER BY ts_ms " +
      s"ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)"
    def medianOf(sorted: String) =
      s"CASE WHEN c % 2 = 1 THEN $sorted[(c+1)//2] " +
        s"ELSE ($sorted[c//2] + $sorted[c//2 + 1])/2.0 END"
    s"""lst AS (SELECT metric, ts_ms, value,
       |            list(value) $frame AS l,
       |            CAST(len(list(value) $frame) AS INTEGER) AS c
       |        FROM base),
       |md AS (SELECT *, ${medianOf("list_sort(l)")} AS med FROM lst),
       |dv AS (SELECT *,
       |           ${medianOf("list_sort(list_transform(l, x -> abs(x - med)))")}
       |             AS mad
       |       FROM md),
       |sc AS (SELECT metric, ts_ms, value,
       |           CASE WHEN mad > 0.0 THEN abs(value - med)/mad END
       |             AS mad_score
       |       FROM dv)
       |SELECT metric, ts_ms, value, mad_score,
       |       COALESCE(mad_score > $threshold, FALSE) AS anomaly
       |FROM sc""".stripMargin
  }

  /** Counter-reset-aware per-second rate — the monitoring-engine `rate()`
    * (PromQL/Graphite semantics): consecutive-point delta over elapsed
    * seconds, where a DECREASE is read as a counter restart from zero and
    * contributes the new value itself rather than a negative delta. The
    * first point of a series has no predecessor → NULL rate.
    *
    * Contrast with the reference's `derivate` (plain deltas, SURVEY
    * §2.3): rate divides by real elapsed time — correct over gaps and
    * irregular spacing — and survives counter restarts, the two things a
    * metrics pipeline needs the moment sources restart or scrape
    * intervals wobble. Plain double arithmetic in one fixed op order, so
    * both engines agree bit-for-bit without the decimal hop.
    *
    * Plan shape: one shuffle on the series key, two lag frames in one
    * Window operator.
    *
    * Output: (metric, ts_ms, value, rate).
    */
  def rate(series: DataFrame): DataFrame = {
    val w = Window.partitionBy("metric").orderBy("ts_ms")
    val lv = lag(col("value"), 1).over(w)
    val lt = lag(col("ts_ms"), 1).over(w)
    val delta = when(col("value") - lv < 0.0, col("value"))
      .otherwise(col("value") - lv)
    // the ts_ms > lt guard pins the duplicate-timestamp behavior: NULL
    // rate on non-advancing time, in BOTH engines. Unguarded, the zero
    // divisor diverges three ways — Spark (non-ANSI) NULL, DuckDB IEEE
    // +Inf, and the streaming form's frontier silently dropping the
    // point — the first two of which would break the oracle the moment
    // the unique-(metric, ts_ms) precondition is violated.
    series
      .withColumn("rate", when(col("ts_ms") > lt,
        delta / ((col("ts_ms") - lt) / lit(1000.0))))
      .select("metric", "ts_ms", "value", "rate")
  }

  /** DuckDB mirror of [[rate]] over a `series`-shaped relation named
    * `base` (declare it in a WITH prefix).
    */
  val rateSql: String =
    s"""lg AS (SELECT metric, ts_ms, value,
       |           lag(value) OVER (PARTITION BY metric ORDER BY ts_ms) AS lv,
       |           lag(ts_ms) OVER (PARTITION BY metric ORDER BY ts_ms) AS lt
       |       FROM base)
       |SELECT metric, ts_ms, value,
       |       CASE WHEN ts_ms > lt THEN
       |         (CASE WHEN value - lv < 0.0 THEN value ELSE value - lv END)
       |           / ((ts_ms - lt) / 1000.0) END AS rate
       |FROM lg""".stripMargin

  /** DuckDB mirror of [[zscore]] over a `series`-shaped relation named
    * `base` (declare it in a WITH prefix).
    */
  def zscoreSql(n: Int, threshold: Double): String = {
    val frame = s"OVER (PARTITION BY metric ORDER BY ts_ms " +
      s"ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)"
    val s1 = "CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) " + frame +
      " AS VARCHAR) AS DOUBLE)"
    val s2 = "CAST(CAST(SUM(CAST(value*value AS DECIMAL(38,10))) " + frame +
      " AS VARCHAR) AS DOUBLE)"
    val cnt = s"CAST(COUNT(*) $frame AS DOUBLE)"
    s"""sc AS (SELECT metric, ts_ms, value,
       |           $s1 AS s1, $s2 AS s2, $cnt AS cnt
       |       FROM base),
       |zs AS (SELECT metric, ts_ms, value,
       |           CASE WHEN SQRT(GREATEST(s2/cnt - POW(s1/cnt, 2.0), 0.0)) > 0.0
       |                THEN (value - s1/cnt)
       |                     / SQRT(GREATEST(s2/cnt - POW(s1/cnt, 2.0), 0.0))
       |           END AS zscore
       |       FROM sc)
       |SELECT metric, ts_ms, value, zscore,
       |       COALESCE(ABS(zscore) > $threshold, FALSE) AS anomaly
       |FROM zs""".stripMargin
  }

  /** Seasonal-naive forecast error — the forecasting-baseline readout
    * every capacity/alerting pipeline starts from: `ŷ(t) = y(t −
    * season)`, summarized per series as MAE and mean (signed) error over
    * the evaluable points (those whose exact season-back slot exists).
    *
    * The predecessor comes from a RANGE window frame pinned to
    * `[t − season, t − season]` — an exact slot-grid lookup without a
    * self-join, so the plan is ONE shuffle on the series key and the
    * per-series aggregate reuses that partitioning (no second exchange).
    * Error sums run through the decimal-exact fold (Exact convention).
    *
    * Output: (metric, n_eval, mae, me).
    */
  def snaive(series: DataFrame, seasonMs: Long): DataFrame = {
    require(seasonMs > 0, s"season must be positive, got $seasonMs")
    val w = Window.partitionBy("metric").orderBy("ts_ms")
      .rangeBetween(-seasonMs, -seasonMs)
    series
      .withColumn("pred", max(col("value")).over(w))
      .where(col("pred").isNotNull)
      .groupBy("metric")
      .agg(count(lit(1)).as("n_eval"),
        graft.core.Exact.davg(abs(col("value") - col("pred"))).as("mae"),
        graft.core.Exact.davg(col("value") - col("pred")).as("me"))
  }

  /** CUSUM⁺ change-point score (Page 1954) — the classic sequential
    * drift detector: `s_t = max(0, s_{t−1} + (x_t − ref))`, alarm when
    * `s_t > threshold`. The recursion has the prefix-sum closed form
    * `s_t = P_t − min(0, min_{j≤t} P_j)` (exact algebra), so the batch
    * plan is two cumulative window frames over ONE (metric) exchange +
    * sort — no per-series fold, no collected arrays. All arithmetic
    * stays in exact decimals until the single output cast, so the score
    * is partition-order-independent and bit-identical to the SQL mirror
    * (and to the streaming recursion, which IS the max(0, ·) form over
    * the same scale-10 decimals).
    *
    * Output: (metric, ts_ms, value, cusum, alarm).
    */
  def cusum(series: DataFrame, ref: Double, threshold: Double): DataFrame = {
    val w = Window.partitionBy("metric").orderBy("ts_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // min(0, m) as a CASE over (28,10) decimals on BOTH engines:
    // DuckDB's LEAST over decimals (and any arithmetic at precision 38)
    // silently promotes to DOUBLE, which would resurrect the raw
    // double-sum rounding this formulation exists to avoid
    val d28 = DecimalType(28, 10)
    val zero = lit(0).cast(d28)
    series
      .withColumn("p",
        sum((col("value") - lit(ref)).cast(d28)).over(w).cast(d28))
      .withColumn("m", min(col("p")).over(w).cast(d28))
      .withColumn("cusum",
        (col("p") - when(col("m") < zero, col("m")).otherwise(zero))
          .cast("double"))
      .select(col("metric"), col("ts_ms"), col("value"), col("cusum"),
        (col("cusum") > threshold).as("alarm"))
  }

  /** DuckDB mirror of [[cusum]] over a `base` relation. */
  def cusumSql(ref: Double, threshold: Double): String = {
    val frame = "OVER (PARTITION BY metric ORDER BY ts_ms " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    val s28 = "DECIMAL(28,10)"
    val m0 = s"CASE WHEN m < CAST(0 AS $s28) THEN m ELSE CAST(0 AS $s28) END"
    s"""pp AS (SELECT metric, ts_ms, value,
       |  CAST(SUM(CAST(value - $ref AS $s28)) $frame AS $s28) AS p
       |       FROM base),
       |mm AS (SELECT metric, ts_ms, value, p,
       |           CAST(MIN(p) $frame AS $s28) AS m FROM pp)
       |SELECT metric, ts_ms, value,
       |       CAST(CAST(p - $m0 AS VARCHAR) AS DOUBLE) AS cusum,
       |       CAST(CAST(p - $m0 AS VARCHAR) AS DOUBLE)
       |         > $threshold AS alarm
       |FROM mm""".stripMargin
  }

  /** DuckDB mirror of [[snaive]] over a `base` relation (metric, ts_ms,
    * value) declared in a WITH prefix.
    */
  def snaiveSql(seasonMs: Long): String =
    s"""pr AS (SELECT metric, ts_ms, value,
       |           MAX(value) OVER (PARTITION BY metric ORDER BY ts_ms
       |             RANGE BETWEEN $seasonMs PRECEDING
       |                       AND $seasonMs PRECEDING) AS pred
       |       FROM base)
       |SELECT metric, COUNT(*) AS n_eval,
       |       ${graft.core.Exact.davgSql("ABS(value - pred)")} AS mae,
       |       ${graft.core.Exact.davgSql("(value - pred)")} AS me
       |FROM pr WHERE pred IS NOT NULL GROUP BY metric""".stripMargin

  /** Holt double-exponential smoothing (level + trend, α = β = 1/2) —
    * the forecasting step past EWMA: `s_t = αx + (1−α)(s+b)`,
    * `b_t = β(s_t − s_{t−1}) + (1−β)b`, seeded `s_1 = x_1, b_1 = 0`.
    * The recurrence carries UNBOUNDED memory, so unlike the trailing-n
    * family there is no window form: the batch operator folds each
    * series row-locally over its sorted points (one shuffle on the
    * series key; in-row cost linear in series length) — fine for
    * bounded per-series cardinality, while the STREAMING form
    * ([[graft.streaming.SeriesStream.holt]]) is the scale path: O(1)
    * state per series, same arithmetic.
    *
    * Cross-engine parity: the recurrence runs in EXACT DECIMAL — the
    * dyadic α deliberately creates scale-10 halves every step, exactly
    * the tie a double-space ROUND resolves differently across engines
    * (Spark rounds the shortest-decimal repr, DuckDB the binary value —
    * measured: 11 of 202 rows off by 1e-9 in the double form). State is
    * DECIMAL(28,9); each step's half-sum is exact at scale 10 and
    * rounds back to scale 9 HALF_UP (Spark's decimal cast ≡ DuckDB's
    * decimal ROUND — DuckDB's decimal CAST truncates and must not be
    * used). Levels lower to double only at the output boundary.
    *
    * Output: (metric, ts_ms, value, level, trend).
    */
  def holt(series: DataFrame): DataFrame = {
    val D9 = DecimalType(28, 9)
    val half = lit(new java.math.BigDecimal("0.5"))
    val pts = sort_array(collect_list(struct(col("ts_ms"), col("value"))))
    def xd(p: Column) = round(p.getField("value"), 9).cast(D9)
    def seedOut(p: Column) = struct(
      p.getField("ts_ms").as("ts_ms"), p.getField("value").as("value"),
      xd(p).as("level"), lit(BigDecimal(0)).cast(D9).as("trend"))
    val first = element_at(col("pts"), 1)
    val zero = struct(xd(first).as("level"),
      lit(BigDecimal(0)).cast(D9).as("trend"),
      array(seedOut(first)).as("outs"))
    val folded = aggregate(
      slice(col("pts"), lit(2), greatest(size(col("pts")) - 1, lit(0))),
      zero,
      (acc, p) => {
        val nl = (half * xd(p) +
          half * (acc.getField("level") + acc.getField("trend"))).cast(D9)
        val nt = (half * (nl - acc.getField("level")) +
          half * acc.getField("trend")).cast(D9)
        struct(nl.as("level"), nt.as("trend"),
          concat(acc.getField("outs"), array(struct(
            p.getField("ts_ms").as("ts_ms"),
            p.getField("value").as("value"),
            nl.as("level"), nt.as("trend")))).as("outs"))
      })
    series.groupBy(col("metric"))
      .agg(pts.as("pts"))
      .select(col("metric"), explode(folded.getField("outs")).as("o"))
      .select(col("metric"), col("o.ts_ms").as("ts_ms"),
        col("o.value").as("value"),
        col("o.level").cast("double").as("level"),
        col("o.trend").cast("double").as("trend"))
  }

  /** DuckDB mirror of [[holt]] over a `base` relation — the recurrence
    * as a RECURSIVE CTE stepping each series one row_number at a time,
    * same exact-decimal ladder (ROUND-then-CAST: DuckDB's decimal ROUND
    * is HALF_UP like Spark's decimal cast; its decimal CAST truncates).
    * The ROW_NUMBER tiebreaks on (ts_ms, value) — the batch fold's
    * `sort_array` order — so same-timestamp points step the recurrence
    * identically on both engines.
    * NOTE: must be spliced into a `WITH RECURSIVE` prefix.
    */
  val holtSql: String = {
    val d9 = "DECIMAL(28,9)"
    val half = s"CAST('0.5' AS DECIMAL(2,1))"
    val nl = s"CAST(ROUND($half * CAST(ROUND(p.value, 9) AS $d9) + " +
      s"$half * (h.level + h.trend), 9) AS $d9)"
    s"""pts AS (SELECT metric, ts_ms, value,
       |          ROW_NUMBER() OVER (PARTITION BY metric
       |                             ORDER BY ts_ms, value) AS rn
       |        FROM base),
       |h AS (
       |  SELECT metric, ts_ms, value, rn,
       |         CAST(ROUND(value, 9) AS $d9) AS level,
       |         CAST(0 AS $d9) AS trend
       |  FROM pts WHERE rn = 1
       |  UNION ALL
       |  SELECT p.metric, p.ts_ms, p.value, p.rn,
       |    $nl,
       |    CAST(ROUND($half * ($nl - h.level) + $half * h.trend, 9)
       |      AS $d9)
       |  FROM h JOIN pts p ON p.metric = h.metric AND p.rn = h.rn + 1)
       |SELECT metric, ts_ms, value,
       |       CAST(CAST(level AS VARCHAR) AS DOUBLE) AS level,
       |       CAST(CAST(trend AS VARCHAR) AS DOUBLE) AS trend
       |FROM h""".stripMargin
  }
}
