package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Exact, SeriesOps}

/** Gate queries for the histogram two-stage ops (SURVEY §2.7, reference
  * `src/dqe_hist*.erl`): `fn(histogram(m, htv, sf, t))`.
  *
  * The reference rounds values to ints before inserting into an HDR
  * histogram (`src/dqe_hist.erl:53-57`), then reduces each histogram to a
  * scalar. Here the two stages are FUSED (SURVEY §2.7 recommendation): the
  * int-rounding is kept, but the reduction computes exact statistics over
  * the window's rounded values instead of going through HDR's lossy bucket
  * quantization — same API, strictly tighter error bounds, and the whole
  * thing is one codegen'd aggregation. (A faithful sketch `Aggregator`
  * with HDR bucketing lives in graft.expr.HdrHistogram for the histogram
  * type itself.)
  */
object HistQueries extends QueryProvider {
  private val Hour = 3600000L

  private def ints: Column = round(col("value"), 0).cast("long")
  private val intsSql = "CAST(ROUND(value, 0) AS BIGINT)"

  // shared bounded kth (value-identical below the bound; the backstop
  // raises loudly instead of an opaque OOM past it)
  private def kth(v: Column, p: Double): Column =
    graft.ops.Aggrs.kthBounded(v, p, graft.ops.Aggrs.KthGroupRowBound)
  private def kthSql(v: String, p: Double): String =
    s"list_sort(list($v))[GREATEST(1, CAST(CEIL($p * COUNT($v)) AS BIGINT))]"

  private val aggs: Map[String, (Column, String)] = Map(
    "hist_min"    -> (min(ints), s"MIN($intsSql)"),
    "hist_max"    -> (max(ints), s"MAX($intsSql)"),
    "hist_mean"   -> (Exact.davg(ints), Exact.davgSql(intsSql)),
    "hist_stddev" -> (Exact.dstddevPop(ints), Exact.dstddevPopSql(intsSql)),
    "hist_median" -> (kth(ints, 0.5), kthSql(intsSql, 0.5)),
    "hist_p90"    -> (kth(ints, 0.9), kthSql(intsSql, 0.9)))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    aggs.map { case (n, (agg, _)) =>
      n -> ((s: SparkSession, d: String) =>
        SeriesOps.series(s, d)
          .where(col("mtype") === "purchase")
          .groupBy(col("metric"), Exact.wstart(col("ts_ms"), Hour).as("ws"))
          .agg(agg.as("value"))
          .orderBy("metric", "ws"))
    }

  def oracle: Map[String, String] =
    aggs.map { case (n, (_, aggSql)) =>
      n ->
        s"""WITH series AS (${SeriesOps.seriesSql})
           |SELECT metric, ${Exact.wstartSql("ts_ms", Hour)} AS ws,
           |       $aggSql AS value
           |FROM series WHERE mtype = 'purchase'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }
}
