package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pointwise transforms & constant arithmetic of SURVEY §2.3 (reference:
  * `src/dqe_*_trans.erl`, `src/dqe_*_arith.erl`). Resolution-preserving —
  * pure `Column` expressions, no shuffle, stay inside whole-stage codegen.
  * `derivate` is the one exception: it needs a per-series time-ordered
  * window (one shuffle on the series key — at scale, data pre-partitioned
  * by series makes it shuffle-free).
  */
object Trans {
  val names: Seq[String] = Seq("derivate", "abs", "sqrt_scale", "log10_scale",
    "min", "max", "confidence", "add", "sub", "mul", "divide")

  /** Expression transforms: value' = f(value). */
  def spark(name: String, c: Option[Double]): Column => Column = {
    def k = c.get
    name match {
      case "abs" => v => abs(v)
      // signed sqrt: f(0)=0, f(-n)=-f(n)  (src/dqe_sqrt_scale_trans.erl:29-31)
      case "sqrt_scale" => v => signum(v) * sqrt(abs(v))
      // signed log10 with f(0)=0  (src/dqe_log10_scale_trans.erl:29-31).
      // Rounded to 9 decimals: log10 is not correctly rounded in either
      // Java's Math or libm, so raw results differ in the last ulp across
      // engines — the oracle mirror rounds identically.
      case "log10_scale" =>
        v => when(v === 0.0, 0.0)
          .otherwise(round(signum(v) * log10(abs(v)), 9))
      case "min"    => v => least(v, lit(k))    // clamp above
      case "max"    => v => greatest(v, lit(k)) // clamp below
      case "add"    => v => v + k
      case "sub"    => v => v - k
      case "mul"    => v => v * k
      case "divide" =>
        require(c.get != 0.0, "divide: constant must be non-zero")
        v => v / k
    }
  }

  def sql(name: String, c: Option[Double], v: String): String = {
    def k = c.get
    name match {
      case "abs"         => s"ABS($v)"
      case "sqrt_scale"  => s"SIGN($v) * SQRT(ABS($v))"
      case "log10_scale" =>
        s"CASE WHEN $v = 0 THEN CAST(0 AS DOUBLE) ELSE ROUND(SIGN($v) * LOG10(ABS($v)), 9) END"
      case "min"         => s"LEAST($v, $k)"
      case "max"         => s"GREATEST($v, $k)"
      case "add"         => s"$v + $k"
      case "sub"         => s"$v - $k"
      case "mul"         => s"$v * $k"
      case "divide"      => s"$v / $k"
    }
  }

  /** derivate: v'(t) = v(t) − v(t−1) per series, first point backfilled with
    * the second difference so length is preserved (src/dqe_derivate.erl:29-32:
    * v'(0)=v'(1)). Input must be a regular series frame (metric, ts_ms,
    * value); operates on present slots in time order.
    */
  def derivate(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("metric").orderBy("ts_ms")
    val d = col("value") - lag("value", 1).over(w)
    val dNext = lead(col("d"), 1).over(w)
    df.withColumn("d", d)
      .withColumn("value", coalesce(col("d"), dNext))
      .drop("d")
  }

  /** DuckDB mirror of [[derivate]] as a SELECT over a series relation. */
  def derivateSql(rel: String): String =
    s"""SELECT metric, mtype, muser, ts_ms,
       |  COALESCE(d, LEAD(d) OVER (PARTITION BY metric ORDER BY ts_ms)) AS value
       |FROM (SELECT *, value - LAG(value) OVER (PARTITION BY metric ORDER BY ts_ms) AS d
       |      FROM $rel)""".stripMargin

  /** confidence(m): replace value with the confidence channel
    * (src/dqe_confidence.erl:23-27). Input must carry a confidence column.
    */
  def confidence(df: DataFrame): DataFrame =
    df.withColumn("value", col("confidence"))
}
