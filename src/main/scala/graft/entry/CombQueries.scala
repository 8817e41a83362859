package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Exact, SeriesOps}
import graft.ops.Combs

/** Gate queries for the 7 combinators (SURVEY §2.4), chained after a daily
  * windowed mean per series (reference queries always feed combinators from
  * equal-resolution children — chaining also exercises aggr→comb
  * composition). Commutative ops run over 5 series; order-sensitive ops
  * over 3 distinctly-typed series so argument order is observable.
  */
object CombQueries extends QueryProvider {
  private val Day = 86400000L
  private val CommMetrics  = Seq("purchase.0", "purchase.1", "purchase.2",
    "purchase.3", "purchase.4")
  // order-sensitive ops need all operands present per slot: per-type daily
  // series (all users pooled) are dense, so the fold is exercised on ~every
  // window rather than the rare triple-coincidence of per-user series
  private val OrderMetrics = Seq("purchase", "error", "click")

  private def orderOp(op: String): Boolean =
    Seq("diff", "product", "quotient").contains(op)

  /** daily mean per per-user series — equal-resolution combinator input */
  private def daily(s: SparkSession, dir: String, ms: Seq[String]): DataFrame =
    SeriesOps.series(s, dir)
      .where(col("metric").isin(ms: _*))
      .groupBy(col("metric"), Exact.wstart(col("ts_ms"), Day).as("ws"))
      .agg(Exact.davg(col("value")).as("value"))

  /** daily mean per event type (metric := mtype) — dense input */
  private def typeDaily(s: SparkSession, dir: String): DataFrame =
    SeriesOps.series(s, dir)
      .groupBy(col("mtype").as("metric"), Exact.wstart(col("ts_ms"), Day).as("ws"))
      .agg(Exact.davg(col("value")).as("value"))

  private def dailySql(ms: Seq[String]): String = {
    val inList = ms.map(m => s"'$m'").mkString(", ")
    s"""daily AS (
       |  SELECT metric, ${Exact.wstartSql("ts_ms", Day)} AS ws,
       |         ${Exact.davgSql("value")} AS value
       |  FROM series WHERE metric IN ($inList) GROUP BY 1, 2)""".stripMargin
  }

  private val typeDailySql: String =
    s"""daily AS (
       |  SELECT mtype AS metric, ${Exact.wstartSql("ts_ms", Day)} AS ws,
       |         ${Exact.davgSql("value")} AS value
       |  FROM series GROUP BY 1, 2)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Combs.names.map { op =>
      s"comb_$op" -> ((s: SparkSession, d: String) => {
        val (in, ms) =
          if (orderOp(op)) (typeDaily(s, d), OrderMetrics)
          else (daily(s, d, CommMetrics), CommMetrics)
        Combs.combine(in, ms, op, tsCol = "ws").orderBy("ws")
      })
    }.toMap

  def oracle: Map[String, String] =
    Combs.names.map { op =>
      val (cte, ms) =
        if (orderOp(op)) (typeDailySql, OrderMetrics)
        else (dailySql(CommMetrics), CommMetrics)
      s"comb_$op" ->
        s"""WITH series AS (${SeriesOps.seriesSql}),
           |$cte
           |SELECT * FROM (${Combs.sql("daily", ms, op, tsCol = "ws")})
           |ORDER BY ws""".stripMargin
    }.toMap
}
