package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Exact, SeriesOps}

/** Gate queries for GROUP BY $tag USING fun (SURVEY §2.5, reference
  * `src/dql_expand.erl:116-127`): series are bucketed by tag value and each
  * bucket combined pointwise with the named combinator. Unlike the
  * reference — which expands one plan node per series and combines lists —
  * this is a single groupBy over (tag, window): series stay *rows*, so the
  * same plan covers 10 or 10 million series (SURVEY §7.2 scaling note).
  */
object GroupQueries extends QueryProvider {
  private val Hour = 3600000L

  /** hourly mean per series (the grouped combinators' input), muser < 10 */
  private def hourly(s: SparkSession, dir: String): DataFrame =
    SeriesOps.series(s, dir)
      .where(col("muser") < 10)
      .groupBy(col("metric"), col("mtype"), col("muser"),
        Exact.wstart(col("ts_ms"), Hour).as("ws"))
      .agg(Exact.davg(col("value")).as("value"))

  private val hourlySql: String =
    s"""hourly AS (
       |  SELECT metric, mtype, muser, ${Exact.wstartSql("ts_ms", Hour)} AS ws,
       |         ${Exact.davgSql("value")} AS value
       |  FROM series WHERE muser < 10 GROUP BY 1, 2, 3, 4)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // GROUP BY $'user' USING sum — combine each user's series pointwise
    "group_user_sum" -> ((s, d) =>
      hourly(s, d).groupBy(col("muser"), col("ws"))
        .agg(Exact.dsum(col("value")).as("value"))
        .orderBy("muser", "ws")),
    // GROUP BY $'type' USING avg
    "group_type_avg" -> ((s, d) =>
      hourly(s, d).groupBy(col("mtype"), col("ws"))
        .agg(Exact.davg(col("value")).as("value"))
        .orderBy("mtype", "ws")),
    // GROUP BY $'type', $'user' USING max — two-tag grouping
    "group_type_user_max" -> ((s, d) =>
      hourly(s, d).groupBy(col("mtype"), col("muser"), col("ws"))
        .agg(max(col("value")).as("value"))
        .orderBy("mtype", "muser", "ws")))

  def oracle: Map[String, String] = Map(
    "group_user_sum" ->
      s"""WITH series AS (${SeriesOps.seriesSql}), $hourlySql
         |SELECT muser, ws, ${Exact.dsumSql("value")} AS value
         |FROM hourly GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "group_type_avg" ->
      s"""WITH series AS (${SeriesOps.seriesSql}), $hourlySql
         |SELECT mtype, ws, ${Exact.davgSql("value")} AS value
         |FROM hourly GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "group_type_user_max" ->
      s"""WITH series AS (${SeriesOps.seriesSql}), $hourlySql
         |SELECT mtype, muser, ws, MAX(value) AS value
         |FROM hourly GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)
}
