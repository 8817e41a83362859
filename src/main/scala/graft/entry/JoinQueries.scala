package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Exact, SeriesOps}
import graft.operators.{AsofJoin, RangeJoin}

/** Gate queries for the join-operator extensions (as-of, range). The
  * reference has no join surface (SURVEY §2.10); these are the two
  * time-series join shapes a pipeline over the series model needs, built
  * scale-first (union+window sweep; chunk-bucketed equi-join) rather than
  * as inequality joins. Oracles: DuckDB's native ASOF JOIN and a plain
  * BETWEEN join — independent formulations of the same semantics.
  */
object JoinQueries extends QueryProvider {
  private val Day = 86400000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // for every purchase point, the most recent click value of the same
    // user at or before it (classic as-of enrichment)
    "asof_series" -> ((s, d) => {
      val ser = SeriesOps.series(s, d)
      val l = ser.where(col("mtype") === "purchase" && col("muser") < 5)
        .select(col("muser"), col("ts_ms"), col("value"))
      val r = ser.where(col("mtype") === "click" && col("muser") < 5)
        .select(col("muser"), col("ts_ms"), col("value"))
      AsofJoin.asof(l, r, Seq("muser"), "ts_ms", "value", "prior_click")
        .orderBy("muser", "ts_ms")
    }),
    // same enrichment with a 24 h staleness bound: older clicks do not count
    "asof_tolerance" -> ((s, d) => {
      val ser = SeriesOps.series(s, d)
      val l = ser.where(col("mtype") === "purchase" && col("muser") < 5)
        .select(col("muser"), col("ts_ms"), col("value"))
      val r = ser.where(col("mtype") === "click" && col("muser") < 5)
        .select(col("muser"), col("ts_ms"), col("value"))
      AsofJoin.asofTolerance(l, r, Seq("muser"), "ts_ms", "value",
        "prior_click", toleranceMs = 86400000L)
        .orderBy("muser", "ts_ms")
    }),
    // the forward direction: the NEXT click at or after each purchase
    "asof_forward" -> ((s, d) => {
      val ser = SeriesOps.series(s, d)
      val l = ser.where(col("mtype") === "purchase" && col("muser") < 5)
        .select(col("muser"), col("ts_ms"), col("value"))
      val r = ser.where(col("mtype") === "click" && col("muser") < 5)
        .select(col("muser"), col("ts_ms"), col("value"))
      AsofJoin.asofForward(l, r, Seq("muser"), "ts_ms", "value",
        "next_click")
        .orderBy("muser", "ts_ms")
    }),
    // clicks inside each user's high-purchase days (interval containment):
    // intervals = days whose purchase mean > 20, points = click series
    "range_clicks" -> ((s, d) => {
      val ser = SeriesOps.series(s, d)
      val pts = ser.where(col("mtype") === "click" && col("muser") < 10)
        .select(col("muser"), col("ts_ms"), col("value"))
      val ivals = ser.where(col("mtype") === "purchase" && col("muser") < 10)
        .groupBy(col("muser"), Exact.wstart(col("ts_ms"), Day).as("lo"))
        .agg(Exact.davg(col("value")).as("m"))
        .where(col("m") > 20)
        .select(col("muser"), col("lo"), (col("lo") + (Day - 1)).as("hi"))
      RangeJoin.join(pts, ivals, Seq("muser"), "ts_ms", "lo", "hi", Day)
        .groupBy(col("muser"), col("lo").as("win_start"))
        .agg(count(lit(1)).as("n_clicks"),
          Exact.davg(col("value")).as("avg_click"))
        .orderBy("muser", "win_start")
    }))

  def oracle: Map[String, String] = Map(
    "asof_series" ->
      s"""WITH series AS (${SeriesOps.seriesSql}),
         |l AS (SELECT muser, ts_ms, value FROM series
         |      WHERE mtype = 'purchase' AND muser < 5),
         |r AS (SELECT muser, ts_ms AS rts, value AS prior_click FROM series
         |      WHERE mtype = 'click' AND muser < 5)
         |SELECT l.muser, l.ts_ms, l.value, r.prior_click
         |FROM l ASOF LEFT JOIN r
         |  ON l.muser = r.muser AND r.rts <= l.ts_ms
         |ORDER BY l.muser, l.ts_ms""".stripMargin,
    "asof_tolerance" ->
      s"""WITH series AS (${SeriesOps.seriesSql}),
         |l AS (SELECT muser, ts_ms, value FROM series
         |      WHERE mtype = 'purchase' AND muser < 5),
         |r AS (SELECT muser, ts_ms AS rts, value AS rv FROM series
         |      WHERE mtype = 'click' AND muser < 5)
         |SELECT l.muser, l.ts_ms, l.value,
         |       CASE WHEN l.ts_ms - r.rts <= 86400000 THEN r.rv END
         |         AS prior_click
         |FROM l ASOF LEFT JOIN r
         |  ON l.muser = r.muser AND r.rts <= l.ts_ms
         |ORDER BY l.muser, l.ts_ms""".stripMargin,
    "asof_forward" ->
      s"""WITH series AS (${SeriesOps.seriesSql}),
         |l AS (SELECT muser, ts_ms, value FROM series
         |      WHERE mtype = 'purchase' AND muser < 5),
         |r AS (SELECT muser, ts_ms AS rts, value AS next_click FROM series
         |      WHERE mtype = 'click' AND muser < 5)
         |SELECT l.muser, l.ts_ms, l.value, r.next_click
         |FROM l ASOF LEFT JOIN r
         |  ON l.muser = r.muser AND r.rts >= l.ts_ms
         |ORDER BY l.muser, l.ts_ms""".stripMargin,
    "range_clicks" ->
      s"""WITH series AS (${SeriesOps.seriesSql}),
         |pts AS (SELECT muser, ts_ms, value FROM series
         |        WHERE mtype = 'click' AND muser < 10),
         |ivals AS (SELECT muser, ${Exact.wstartSql("ts_ms", Day)} AS lo,
         |                 ${Exact.wstartSql("ts_ms", Day)} + ${Day - 1} AS hi
         |          FROM series WHERE mtype = 'purchase' AND muser < 10
         |          GROUP BY 1, 2
         |          HAVING ${Exact.davgSql("value")} > 20)
         |SELECT i.muser, i.lo AS win_start, COUNT(*) AS n_clicks,
         |       ${Exact.davgSql("p.value")} AS avg_click
         |FROM ivals i JOIN pts p
         |  ON p.muser = i.muser AND p.ts_ms BETWEEN i.lo AND i.hi
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin)
}
