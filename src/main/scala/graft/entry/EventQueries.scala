package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.SeriesOps
import graft.ops.Events
import graft.ops.Events._

/** Gate queries for the event scan + filter operators (SURVEY §2.9):
  * comparison on a JSON payload path, regex match, and a boolean
  * AND/OR/NOT combination — the reference's full predicate surface.
  */
object EventQueries extends QueryProvider {
  private val evCols = Set("event_id", "ts_ms", "user_id", "event_type", "value")

  private val filters: Map[String, Filter] = Map(
    // EVENTS FROM 'events' WHERE 'event_type' == 'error' AND 'k' >= 50
    "events_filter_cmp" ->
      And(Seq(Cmp("event_type", "==", "error"), Cmp("k", ">=", 50))),
    // ... WHERE 'event_type' ~= 'pur|cli' AND 'k' < 30
    "events_filter_regex" ->
      And(Seq(Regex("event_type", "pur|cli"), Cmp("k", "<", 30))),
    // ... WHERE ('k' < 20 OR 'k' > 80) AND NOT 'event_type' == 'view'
    "events_filter_bool" ->
      And(Seq(Or(Cmp("k", "<", 20), Cmp("k", ">", 80)),
        Not(Cmp("event_type", "==", "view")))))

  private def run(f: Filter)(s: SparkSession, dir: String): DataFrame = {
    val ev = SeriesOps.events(s, dir)
    ev.where(Events.compile(ev, f))
      .select("event_id", "ts_ms", "event_type", "value")
      .orderBy("event_id")
  }

  /** 12 h session gap — the testdata's mean per-user inter-event gap is
    * ~11 h, so this splits and merges in comparable measure (a web-style
    * 30 min gap would make nearly every event its own session here).
    */
  private[entry] val SessionGapMs = 43200000L
  private[entry] val FunnelSteps = Seq("view", "click", "purchase")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    filters.map { case (n, f) =>
      n -> ((s: SparkSession, d: String) => run(f)(s, d))
    } ++ Map[String, (SparkSession, String) => DataFrame](
      "events_sessionize" -> ((s, d) =>
        graft.ops.Sessions.sessionize(
          SeriesOps.events(s, d, widen = false), SessionGapMs)
          .orderBy("user_id", "session_idx")),
      "events_funnel" -> ((s, d) =>
        graft.ops.Sessions.funnel(
          SeriesOps.events(s, d, widen = false), FunnelSteps)
          .orderBy("step_idx")),
      "events_paths" -> ((s, d) =>
        graft.ops.Sessions.topPaths(
          SeriesOps.events(s, d, widen = false), n = 3, k = 20)),
      // weekly cohort retention triangle
      "events_retention" -> ((s, d) =>
        graft.ops.Sessions.retention(
          SeriesOps.events(s, d, widen = false), bucketMs = 604800000L)
          .orderBy("cohort", "bucket_offset")),
      // session-size distribution: bounce bucket vs long-session tail
      "events_session_stats" -> ((s, d) =>
        graft.ops.Sessions.sessionStats(
          SeriesOps.events(s, d, widen = false), SessionGapMs)
          .orderBy("n_events")),
      // RFM customer segmentation board over purchase events
      "events_rfm" -> ((s, d) =>
        graft.ops.Sessions.rfm(SeriesOps.events(s, d, widen = false))
          .orderBy("user_id")),
      // last-touch attribution: purchases credited to the most recent
      // click at-or-before them within 3 days
      "events_attribution" -> ((s, d) =>
        graft.ops.Sessions.attribution(
          SeriesOps.events(s, d, widen = false), "click", "purchase",
          windowMs = 259200000L).orderBy("user_id", "conv_id")),
      // the DAU/WAU board: daily + trailing-7-day distinct actives
      "events_active" -> ((s, d) =>
        graft.ops.Sessions.activeUsers(
          SeriesOps.events(s, d, widen = false), dayMs = 86400000L,
          windowDays = 7).orderBy("day")),
      // ROLLUP (type, day) — the multi-level subtotal report: Catalyst's
      // Expand emits all grouping levels in ONE pass over the input (no
      // per-level rescan); counts and decimal-exact sums per level
      "events_rollup" -> ((s, d) =>
        SeriesOps.events(s, d)
          .withColumn("day", expr("ts_ms div 86400000"))
          .rollup(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n_events"),
            graft.core.Exact.dsum(col("value")).as("sum_value"))
          .orderBy(col("event_type").asc_nulls_first,
            col("day").asc_nulls_first)),
      // PIVOT day × event-type — the wide activity report: one Expand +
      // one aggregation, never a per-type self-join; absent combinations
      // stay NULL (both engines' empty-group convention)
      "events_pivot" -> ((s, d) =>
        SeriesOps.events(s, d)
          .withColumn("day", expr("ts_ms div 86400000"))
          .groupBy("day")
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .orderBy("day")),
      // per-event lag features (the sessionized feature-extraction
      // shape for ML training rows): previous event type, inter-event
      // gap, ordinal — one shuffle on user_id, one sort feeds all three
      // window functions; ties on ts break on event_id so both engines
      // order identically
      "events_features" -> ((s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_ms", "event_id")
        SeriesOps.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts_ms"),
            col("event_type"),
            lag(col("event_type"), 1).over(w).as("prev_type"),
            (col("ts_ms") - lag(col("ts_ms"), 1).over(w)).as("gap_ms"),
            row_number().over(w).cast("long").as("evt_idx"))
          .orderBy("user_id", "evt_idx")
      }),
      // set operations as FIRST-CLASS operators (§2.10 host-engine
      // proof): Spark's Except/Intersect nodes, not hand-rolled joins —
      // Catalyst lowers them to aggregated semi/anti forms itself
      "events_except" -> ((s, d) => {
        val ev = SeriesOps.events(s, d)
        ev.where(col("event_type") === "view").select("user_id")
          .except(ev.where(col("event_type") === "purchase" &&
            col("value") > 95).select("user_id"))
          .orderBy("user_id")
      }),
      "events_intersect" -> ((s, d) => {
        val ev = SeriesOps.events(s, d)
        ev.where(col("event_type") === "view" && col("value") > 90)
          .select("user_id")
          .intersect(ev.where(col("event_type") === "error" &&
            col("value") > 90).select("user_id"))
          .orderBy("user_id")
      }),
      // the funnel with a 3-day conversion deadline (windowFunnel shape)
      "events_funnel_window" -> ((s, d) =>
        graft.ops.Sessions.funnelWithin(
          SeriesOps.events(s, d, widen = false), FunnelSteps,
          windowMs = 259200000L).orderBy("step_idx")),
      // within-session event-type transition matrix (Markov view)
      "events_transitions" -> ((s, d) =>
        graft.ops.Sessions.transitions(
          SeriesOps.events(s, d, widen = false), SessionGapMs)
          .orderBy("from_type", "to_type")))

  def oracle: Map[String, String] =
    filters.map { case (n, f) =>
      n ->
        s"""SELECT event_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, event_type, value
           |FROM events WHERE ${Events.sql(f, evCols)}
           |ORDER BY event_id""".stripMargin
    } ++ Map(
      "events_sessionize" -> graft.ops.Sessions.sessionizeSql(SessionGapMs),
      "events_funnel" -> graft.ops.Sessions.funnelSql(FunnelSteps),
      "events_paths" -> graft.ops.Sessions.topPathsSql(3, 20),
      "events_retention" -> graft.ops.Sessions.retentionSql(604800000L),
      "events_session_stats" ->
        graft.ops.Sessions.sessionStatsSql(SessionGapMs),
      "events_active" ->
        graft.ops.Sessions.activeUsersSql(86400000L, 7),
      "events_attribution" ->
        graft.ops.Sessions.attributionSql("click", "purchase", 259200000L),
      "events_rfm" -> graft.ops.Sessions.rfmSql,
      "events_rollup" ->
        s"""WITH e AS (SELECT event_type,
           |             CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day,
           |             value
           |           FROM events)
           |SELECT event_type, day, COUNT(*) AS n_events,
           |       ${graft.core.Exact.dsumSql("value")} AS sum_value
           |FROM e GROUP BY ROLLUP (event_type, day)
           |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,
      "events_pivot" -> {
        val cols = Seq("click", "error", "purchase", "signup", "view")
          .map(t => s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 END) " +
            s"AS BIGINT) AS $t").mkString(",\n|       ")
        s"""WITH e AS (SELECT event_type,
           |             CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day
           |           FROM events)
           |SELECT day,
           |       $cols
           |FROM e GROUP BY day ORDER BY day""".stripMargin
      },
      "events_features" ->
        """WITH e AS (SELECT user_id, event_id,
          |             CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, event_type
          |           FROM events)
          |SELECT user_id, event_id, ts_ms, event_type,
          |       LAG(event_type, 1) OVER w AS prev_type,
          |       ts_ms - LAG(ts_ms, 1) OVER w AS gap_ms,
          |       CAST(ROW_NUMBER() OVER w AS BIGINT) AS evt_idx
          |FROM e
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
          |ORDER BY user_id, evt_idx""".stripMargin,
      "events_except" ->
        """SELECT user_id FROM events WHERE event_type = 'view'
          |EXCEPT
          |SELECT user_id FROM events
          |WHERE event_type = 'purchase' AND value > 95
          |ORDER BY user_id""".stripMargin,
      "events_intersect" ->
        """SELECT user_id FROM events
          |WHERE event_type = 'view' AND value > 90
          |INTERSECT
          |SELECT user_id FROM events
          |WHERE event_type = 'error' AND value > 90
          |ORDER BY user_id""".stripMargin,
      "events_funnel_window" ->
        graft.ops.Sessions.funnelWithinSql(FunnelSteps, 259200000L),
      "events_transitions" -> graft.ops.Sessions.transitionsSql(SessionGapMs))
}
