package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Exact, SeriesOps}

/** Gate queries for TOP/BOTTOM n BY fun (SURVEY §2.6, reference
  * `src/dqe_funnel.erl:36-71`), SHIFT BY (§2.8), and output naming with
  * positional/tag variables + METADATA (§2.8).
  *
  * TOP/BOTTOM scoring runs the fn over each output series' ENTIRE range
  * collapsed to one scalar (not per-window-then-avg — SURVEY §7.3 pitfall),
  * then keeps the n best series' full streams. Ties break on metric name so
  * the winner set is deterministic. The scores frame is tiny (one row per
  * series), so the winner join is a broadcast semi-join — no shuffle of the
  * point stream.
  */
object LimitQueries extends QueryProvider {
  private val Hour = 3600000L
  private val Day  = 86400000L
  // presented range for SHIFT: [2024-01-08, 2024-01-15)
  private val ShiftStart = 1704672000000L
  private val ShiftEnd   = 1705276800000L

  private def purchase(s: SparkSession, dir: String): DataFrame =
    SeriesOps.series(s, dir).where(col("mtype") === "purchase")

  private def topBottom(desc: Boolean)(s: SparkSession, dir: String): DataFrame = {
    val p = purchase(s, dir)
    val scores = p.groupBy(col("metric"))
      .agg(Exact.davg(col("value")).as("score"))
    val ordered = if (desc) scores.orderBy(col("score").desc, col("metric").asc)
                  else scores.orderBy(col("score").asc, col("metric").asc)
    val winners = ordered.limit(3).select("metric")
    p.join(broadcast(winners), Seq("metric"), "left_semi")
      .select("metric", "ts_ms", "value")
      .orderBy("metric", "ts_ms")
  }

  private def topBottomSql(desc: Boolean): String = {
    val dir = if (desc) "DESC" else "ASC"
    s"""WITH series AS (${SeriesOps.seriesSql}),
       |p AS (SELECT * FROM series WHERE mtype = 'purchase'),
       |scores AS (SELECT metric, ${Exact.davgSql("value")} AS score
       |           FROM p GROUP BY metric),
       |winners AS (SELECT metric FROM scores ORDER BY score $dir, metric LIMIT 3)
       |SELECT metric, ts_ms, value FROM p
       |WHERE metric IN (SELECT metric FROM winners)
       |ORDER BY metric, ts_ms""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "limit_top"    -> ((s, d) => topBottom(desc = true)(s, d)),
    "limit_bottom" -> ((s, d) => topBottom(desc = false)(s, d)),
    // SHIFT BY 1d: evaluate over the range shifted into the past, present
    // on the current axis (src/dql_resolution.erl:118-135)
    "shift_1d" -> ((s, d) =>
      purchase(s, d)
        .withColumn("ts_ms", col("ts_ms") + Day)
        .where(col("ts_ms") >= ShiftStart && col("ts_ms") < ShiftEnd)
        .groupBy(col("metric"), Exact.wstart(col("ts_ms"), Hour).as("ws"))
        .agg(Exact.davg(col("value")).as("value"))
        .orderBy("metric", "ws")),
    // AS 'rate'.$1.$2 METADATA {'team': 'infra'} over derivate(m)
    // ($N = N-th metric path segment, src/dql_naming.erl:25-70)
    "naming_pvar" -> ((s, d) =>
      graft.ops.Trans.derivate(purchase(s, d).where(col("muser") < 10))
        .select(
          concat_ws(".", lit("rate"), col("mtype"), col("muser")).as("name"),
          lit("""{"team": "infra"}""").as("metadata"),
          col("ts_ms"), col("value"))
        .orderBy("name", "ts_ms")))

  def oracle: Map[String, String] = Map(
    "limit_top"    -> topBottomSql(desc = true),
    "limit_bottom" -> topBottomSql(desc = false),
    "shift_1d" ->
      s"""WITH series AS (${SeriesOps.seriesSql}),
         |shifted AS (SELECT metric, ts_ms + $Day AS ts_ms, value FROM series
         |            WHERE mtype = 'purchase')
         |SELECT metric, ${Exact.wstartSql("ts_ms", Hour)} AS ws,
         |       ${Exact.davgSql("value")} AS value
         |FROM shifted WHERE ts_ms >= $ShiftStart AND ts_ms < $ShiftEnd
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "naming_pvar" ->
      s"""WITH series AS (${SeriesOps.seriesSql}),
         |p AS (SELECT * FROM series WHERE mtype = 'purchase' AND muser < 10),
         |d AS (${graft.ops.Trans.derivateSql("p")})
         |SELECT 'rate.' || mtype || '.' || CAST(muser AS VARCHAR) AS name,
         |       '{"team": "infra"}' AS metadata, ts_ms, value
         |FROM d ORDER BY name, ts_ms""".stripMargin)
}
