package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Exact, SeriesOps}
import graft.ops.Aggrs

/** Gate queries for the 20 windowed aggregations (SURVEY §2.2): the 14
  * value-channel ops over 1 h tumbling windows, plus the 6 `*_conf` ops over
  * the confidence channel of a gap-filled day.
  */
object AggrQueries extends QueryProvider {
  private val W = 3600000L // 1 h windows
  /** threshold / percentile constants per op (None = no constant) */
  private def const(n: String): Option[Double] = n match {
    case "percentile"                   => Some(0.9)
    case n if n.contains("_")           => Some(100.0) // count/first/last thresholds
    case _                              => None
  }

  // confidence-channel window: one gap-filled day of the 'purchase' series
  private val DayStart = 1704412800000L // 2024-01-05T00:00:00Z
  private val DayEnd   = 1704499200000L // 2024-01-06T00:00:00Z
  private val ConfOps  = Seq("count_above", "count_below", "first_above",
    "first_below", "last_above", "last_below")

  private def valueQuery(n: String)(s: SparkSession, dir: String): DataFrame =
    SeriesOps.series(s, dir)
      .where(col("mtype").isin("purchase", "error"))
      .groupBy(col("metric"), Exact.wstart(col("ts_ms"), W).as("ws"))
      .agg(Aggrs.spark(n, const(n))(col("value"), col("ts_ms")).as("value"))
      .orderBy("metric", "ws")

  /** `*_conf` ops: threshold tests the confidence channel; first/last return
    * the *value* of the qualifying point (count ops return the count).
    * Reference: src/dqe_*_conf_aggr.erl (SURVEY §2.2).
    */
  private def confQuery(n: String)(s: SparkSession, dir: String): DataFrame = {
    val g = SeriesOps.gapFilled(s, dir, DayStart, DayEnd, Some("purchase"),
      muserMax = Some(10L))
    val agg = n match {
      case "count_above" => count(when(col("confidence") > 0.5, 1))
      case "count_below" => count(when(col("confidence") < 0.5, 1))
      case "first_above" => min_by(col("value"), when(col("confidence") > 0.5, col("ts_ms")))
      case "first_below" => min_by(col("value"), when(col("confidence") < 0.5, col("ts_ms")))
      case "last_above"  => max_by(col("value"), when(col("confidence") > 0.5, col("ts_ms")))
      case "last_below"  => max_by(col("value"), when(col("confidence") < 0.5, col("ts_ms")))
    }
    g.groupBy(col("metric"), Exact.wstart(col("ts_ms"), W).as("ws"))
      .agg(agg.as("value"))
      .orderBy("metric", "ws")
  }

  private def confSqlAgg(n: String): String = n match {
    case "count_above" => "COUNT(CASE WHEN confidence > 0.5 THEN 1 END)"
    case "count_below" => "COUNT(CASE WHEN confidence < 0.5 THEN 1 END)"
    case "first_above" => "MIN_BY(value, CASE WHEN confidence > 0.5 THEN ts_ms END)"
    case "first_below" => "MIN_BY(value, CASE WHEN confidence < 0.5 THEN ts_ms END)"
    case "last_above"  => "MAX_BY(value, CASE WHEN confidence > 0.5 THEN ts_ms END)"
    case "last_below"  => "MAX_BY(value, CASE WHEN confidence < 0.5 THEN ts_ms END)"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Aggrs.names.map(n => s"aggr_$n" ->
      ((s: SparkSession, d: String) => valueQuery(n)(s, d))).toMap ++
    ConfOps.map(n => s"conf_$n" ->
      ((s: SparkSession, d: String) => confQuery(n)(s, d))).toMap

  def oracle: Map[String, String] =
    Aggrs.names.map { n =>
      s"aggr_$n" ->
        s"""WITH series AS (${SeriesOps.seriesSql})
           |SELECT metric, ${Exact.wstartSql("ts_ms", W)} AS ws,
           |       ${Aggrs.sql(n, const(n), "value", "ts_ms")} AS value
           |FROM series WHERE mtype IN ('purchase', 'error')
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }.toMap ++
    ConfOps.map { n =>
      s"conf_$n" ->
        s"""${SeriesOps.gapFilledSql(DayStart, DayEnd, Some("purchase"), Some(10L))}
           |SELECT metric, ${Exact.wstartSql("ts_ms", W)} AS ws,
           |       ${confSqlAgg(n)} AS value
           |FROM gapfilled GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }.toMap
}
