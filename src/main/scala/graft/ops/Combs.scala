package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Exact

/** The 7 combinators of SURVEY §2.4 (reference: `src/dqe_*_comb.erl`):
  * N series → 1, element-wise across series aligned on timestamp.
  *
  * Semantics pins (under-specified in the reference, which gap-fills with
  * empty confidence-0 points and defers to mmath):
  *   - commutative ops (sum/avg/min/max) aggregate over the series *present*
  *     at each timestamp (empty points contribute nothing);
  *   - order-sensitive ops (diff/product/quotient) require all operands
  *     present, else the point is NULL. `diff` is first-minus-rest,
  *     `quotient` folds left with division-by-zero treated as division by
  *     one (src/dqe_quotient_comb.erl:28-31) — both fold in argument order
  *     and must NOT be commuted (SURVEY §7.3).
  *
  * Shape: one shuffle (groupBy ts). The order-sensitive path pivots the N
  * named series into columns with conditional aggregation — N is the arity
  * of the query, always small, so the fold is a plain codegen'd expression.
  */
object Combs {
  val names: Seq[String] = Seq("sum", "avg", "min", "max", "diff", "product",
    "quotient")

  /** input: (metric, ts, value)-shaped frame; output: (ts, value). */
  def combine(df: DataFrame, metrics: Seq[String], op: String,
              tsCol: String = "ts_ms"): DataFrame = {
    val f = df.where(col("metric").isin(metrics: _*))
    op match {
      case "sum" => f.groupBy(tsCol).agg(Exact.dsum(col("value")).as("value"))
      case "avg" => f.groupBy(tsCol).agg(Exact.davg(col("value")).as("value"))
      case "min" => f.groupBy(tsCol).agg(min(col("value")).as("value"))
      case "max" => f.groupBy(tsCol).agg(max(col("value")).as("value"))
      case "diff" | "product" | "quotient" =>
        val pivots = metrics.zipWithIndex.map { case (m, i) =>
          max(when(col("metric") === m, col("value"))).as(s"c$i")
        }
        val piv = f.groupBy(tsCol).agg(pivots.head, pivots.tail: _*)
        val rest = metrics.indices.tail
        val folded: Column = op match {
          case "diff"    => rest.foldLeft(col("c0"))((a, i) => a - col(s"c$i"))
          case "product" => rest.foldLeft(col("c0"))((a, i) => a * col(s"c$i"))
          case "quotient" => rest.foldLeft(col("c0")) { (a, i) =>
            when(col(s"c$i") === 0.0, a).otherwise(a / col(s"c$i"))
          }
        }
        piv.select(col(tsCol), folded.as("value"))
    }
  }

  /** DuckDB mirror over a relation with (metric, ts, value). */
  def sql(rel: String, metrics: Seq[String], op: String,
          tsCol: String = "ts_ms"): String = {
    val inList = metrics.map(m => s"'$m'").mkString(", ")
    op match {
      case "sum" | "avg" | "min" | "max" =>
        val agg = op match {
          case "sum" => Exact.dsumSql("value")
          case "avg" => Exact.davgSql("value")
          case "min" => "MIN(value)"
          case "max" => "MAX(value)"
        }
        s"""SELECT $tsCol, $agg AS value FROM $rel
           |WHERE metric IN ($inList) GROUP BY $tsCol""".stripMargin
      case "diff" | "product" | "quotient" =>
        val pivots = metrics.zipWithIndex.map { case (m, i) =>
          s"MAX(CASE WHEN metric = '$m' THEN value END) AS c$i"
        }.mkString(", ")
        val rest = metrics.indices.tail
        val folded = op match {
          case "diff"    => rest.foldLeft("c0")((a, i) => s"($a - c$i)")
          case "product" => rest.foldLeft("c0")((a, i) => s"($a * c$i)")
          case "quotient" =>
            rest.foldLeft("c0")((a, i) => s"(CASE WHEN c$i = 0 THEN $a ELSE $a / c$i END)")
        }
        s"""SELECT $tsCol, $folded AS value FROM (
           |  SELECT $tsCol, $pivots FROM $rel
           |  WHERE metric IN ($inList) GROUP BY $tsCol)""".stripMargin
    }
  }
}
