package graft.ops

import org.apache.spark.sql.DataFrame
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
}
