package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Edge semantics of the event-sequence operators (sessionize, funnel,
  * topPaths) the corpus-backed gates cannot pin: the exact-gap boundary,
  * equal-timestamp tie-breaks, strictly-after funnel ordering, and the
  * minimum-length path filter.
  */
class SessionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ev(rows: (Long, Long, Long, String, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("event_id", "ts_ms", "user_id", "event_type", "value")
  }

  // --------------------------------------------------------- sessionize

  test("gap of exactly gapMs merges (session_window's closed boundary); above splits") {
    val df = ev(
      (1L, 0L, 7L, "view", 1.0),
      (2L, 1000L, 7L, "view", 2.0),   // gap 1000 = gapMs → still merges
      (3L, 2001L, 7L, "view", 4.0),   // gap 1001 > gapMs → NEW session
      (4L, 2500L, 7L, "view", 8.0))   // gap 499 → joins session 2
    val out = Sessions.sessionize(df, 1000L)
      .orderBy("session_idx")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1L, 0L, 1000L, 2L, 3.0),
      (2L, 2001L, 2500L, 2L, 12.0)))
  }

  test("sessions are per-user; simultaneous users never merge") {
    val df = ev(
      (1L, 0L, 1L, "view", 1.0),
      (2L, 0L, 2L, "view", 1.0),
      (3L, 10L, 1L, "view", 1.0),
      (4L, 10L, 2L, "view", 1.0))
    val out = Sessions.sessionize(df, 1000L).collect()
    assert(out.length == 2)
    assert(out.forall(_.getLong(4) == 2L)) // n_events per user-session
  }

  test("equal timestamps fold into one session deterministically") {
    val df = ev(
      (5L, 100L, 3L, "a", 1.0),
      (4L, 100L, 3L, "b", 2.0),
      (6L, 100L, 3L, "c", 4.0))
    val out = Sessions.sessionize(df, 1L).collect()
    assert(out.length == 1 && out.head.getLong(4) == 3L &&
      out.head.getDouble(5) == 7.0)
  }

  // ------------------------------------------------------------- funnel

  test("funnel counts only strictly-ordered conversions") {
    val df = ev(
      // user 1: full ordered funnel
      (1L, 10L, 1L, "view", 0.0),
      (2L, 20L, 1L, "click", 0.0),
      (3L, 30L, 1L, "purchase", 0.0),
      // user 2: click BEFORE first view — purchase without a qualifying
      // click never converts past step 0
      (4L, 10L, 2L, "click", 0.0),
      (5L, 20L, 2L, "view", 0.0),
      (6L, 30L, 2L, "purchase", 0.0),
      // user 3: view only
      (7L, 10L, 3L, "view", 0.0),
      // user 4: no view at all
      (8L, 10L, 4L, "purchase", 0.0))
    val out = Sessions.funnel(df, Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, "view", 3L), (1L, "click", 1L), (2L, "purchase", 1L)))
  }

  test("a click at the same millisecond as the view does not convert") {
    val df = ev(
      (1L, 10L, 1L, "view", 0.0),
      (2L, 10L, 1L, "click", 0.0))
    val out = Sessions.funnel(df, Seq("view", "click"))
      .orderBy("step_idx").collect().map(_.getLong(2))
    assert(out.toSeq == Seq(1L, 0L))
  }

  // ----------------------------------------------------------- topPaths

  test("topPaths keeps only users with >= n events, ordered by time") {
    val df = ev(
      (1L, 30L, 1L, "c", 0.0),
      (2L, 10L, 1L, "a", 0.0),
      (3L, 20L, 1L, "b", 0.0),
      (4L, 10L, 2L, "a", 0.0),
      (5L, 20L, 2L, "b", 0.0),
      (6L, 30L, 2L, "c", 0.0),
      (7L, 99L, 2L, "d", 0.0), // 4th event ignored (n=3)
      (8L, 10L, 3L, "a", 0.0)) // only 1 event → dropped
    val out = Sessions.topPaths(df, n = 3, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a>b>c", 2L)))
  }

  // ---------------------------------------------------------- retention

  test("retention cohorts on the first event's bucket; offsets count from it") {
    val df = ev(
      (1L, 0L, 1L, "view", 0.0),       // u1: cohort 0, active buckets 0,2
      (2L, 2000L, 1L, "view", 0.0),
      (3L, 1000L, 2L, "view", 0.0),    // u2: cohort 1, active buckets 0,1
      (4L, 2999L, 2L, "view", 0.0))
    val out = Sessions.retention(df, bucketMs = 1000L)
      .orderBy("cohort", "bucket_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  // ------------------------------------------------------------- zscore

  test("rolling zscore: one-point window yields NULL z, spikes flag") {
    val s = spark
    import s.implicits._
    // 10 flat points then a spike. A lone outlier among n window points
    // scores exactly z = sqrt(n-1) (the self-inflated-sigma identity), so
    // an 11-point window puts the spike at sqrt(10) ≈ 3.16 > 3 — and a
    // 10-point window would sit exactly ON the threshold, unflagged.
    val rows = (0L until 10L).map(i => ("m", i, 10.0)) :+ (("m", 10L, 100.0))
    val df = rows.toDF("metric", "ts_ms", "value")
    val out = Rolling.zscore(df, n = 11, threshold = 3.0)
      .orderBy("ts_ms").collect()
    assert(out.head.isNullAt(3) && !out.head.getBoolean(4)) // first point
    assert(out.take(10).forall(!_.getBoolean(4)))           // flat run
    assert(out.last.getBoolean(4))                          // the spike
    assert(math.abs(out.last.getDouble(3) - math.sqrt(10.0)) < 1e-9)
  }

  test("transitions: session boundaries break chains; ties order on" +
    " event_id") {
    // user 1: a→b then a gap > 10 → c: only (a,b) counts, never (b,c).
    // user 2: equal-ts pair ordered by event_id → (x,y).
    val df = ev(
      (1L, 0L, 1L, "a", 0.0),
      (2L, 5L, 1L, "b", 0.0),
      (3L, 100L, 1L, "c", 0.0),
      (5L, 0L, 2L, "y", 0.0),
      (4L, 0L, 2L, "x", 0.0))
    val out = Sessions.transitions(df, gapMs = 10L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(("a", "b", 1L), ("x", "y", 1L)))
  }

  test("ewma: first point smooths to itself; constants are fixed points;" +
    " dyadic weights exact") {
    val s = spark
    import s.implicits._
    // constant series: EWMA must reproduce the constant exactly
    val flat = (0L until 20L).map(i => ("m", i, 42.5)).toDF(
      "metric", "ts_ms", "value")
    val fo = Rolling.ewma(flat, n = 8).orderBy("ts_ms").collect()
    assert(fo.forall(r => r.getDouble(3) == 42.5))
    // two points, n = 2: weights (2, 1) → ewma = (2·v1 + 1·v0) / 3
    val two = Seq(("m", 0L, 0.0), ("m", 1L, 1.0)).toDF(
      "metric", "ts_ms", "value")
    val to = Rolling.ewma(two, n = 2).orderBy("ts_ms").collect()
    assert(to.head.getDouble(3) == 0.0) // head renormalizes to itself
    assert(math.abs(to.last.getDouble(3) - 2.0 / 3.0) < 1e-12)
  }

  test("activeUsers: trailing window covers, expired days drop out") {
    // dayMs=10: u1@day0, u2@day0, u2@day3, u1@day8; window=7 days
    val df = ev(
      (1L, 0L, 1L, "a", 0.0), (2L, 5L, 2L, "a", 0.0),
      (3L, 30L, 2L, "a", 0.0), (4L, 80L, 1L, "a", 0.0))
    val out = Sessions.activeUsers(df, dayMs = 10L, windowDays = 7)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L),   // both active day 0
      (3L, 1L, 2L),   // dau=u2; wau still sees day-0 activity
      (8L, 1L, 2L)))  // day 0 expired (covers 0–6); day 3 still in
  }

  test("funnelWithin: deadline binds to first step-0; boundary inclusive") {
    // u1: a@0, b@50 — inside a 50 window (inclusive boundary), converts.
    // u2: a@0, b@51 — one past the deadline, step 1 does not count.
    // u3: a@0, a@100, b@120 — the LATER a does not re-open the window.
    val df = ev(
      (1L, 0L, 1L, "a", 0.0), (2L, 50L, 1L, "b", 0.0),
      (3L, 0L, 2L, "a", 0.0), (4L, 51L, 2L, "b", 0.0),
      (5L, 0L, 3L, "a", 0.0), (6L, 100L, 3L, "a", 0.0),
      (7L, 120L, 3L, "b", 0.0))
    val out = Sessions.funnelWithin(df, Seq("a", "b"), windowMs = 50L)
      .orderBy("step_idx").collect().map(_.getLong(2))
    assert(out.toSeq == Seq(3L, 1L)) // 3 start, only u1 converts
    // and the unbounded funnel would have counted all three
    val un = Sessions.funnel(df, Seq("a", "b"))
      .orderBy("step_idx").collect().map(_.getLong(2))
    assert(un.toSeq == Seq(3L, 3L))
  }

  test("mad: robust flag on varied window; zero MAD yields NULL, no flag") {
    val s = spark
    import s.implicits._
    // varied series then a spike: sorted window [9,9,11,11,100] → median
    // 11, deviations sorted [0,0,2,2,89] → MAD 2, score |100−11|/2 = 44.5
    val varied = (Seq(9.0, 11.0, 9.0, 11.0, 100.0).zipWithIndex.map {
      case (v, i) => ("m", i.toLong, v) }).toDF("metric", "ts_ms", "value")
    val vo = Rolling.mad(varied, n = 5, threshold = 3.0)
      .orderBy("ts_ms").collect()
    assert(vo.last.getBoolean(4) && vo.last.getDouble(3) == 44.5)
    // majority-flat window: MAD 0 even with the spike present — the
    // degenerate case yields NULL score and never flags
    val flat = (Seq(10.0, 10.0, 10.0, 10.0, 100.0).zipWithIndex.map {
      case (v, i) => ("m", i.toLong, v) }).toDF("metric", "ts_ms", "value")
    val fo = Rolling.mad(flat, n = 5, threshold = 3.0)
      .orderBy("ts_ms").collect()
    assert(fo.last.isNullAt(3) && !fo.last.getBoolean(4))
  }

  test("rate: counter resets contribute the restarted value, elapsed" +
    " time divides") {
    val s = spark
    import s.implicits._
    // 0→10 over 2 s (rate 5), 10→4 is a RESET (rate 4/1, not −6),
    // 4→4 over 4 s (rate 0); first point NULL
    val df = Seq(("m", 0L, 0.0), ("m", 2000L, 10.0), ("m", 3000L, 4.0),
      ("m", 7000L, 4.0)).toDF("metric", "ts_ms", "value")
    val out = Rolling.rate(df).orderBy("ts_ms").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(out.toSeq == Seq(None, Some(5.0), Some(4.0), Some(0.0)))
  }

  test("topPaths ties at equal timestamps break on event_id") {
    val df = ev(
      (2L, 10L, 1L, "x", 0.0),
      (1L, 10L, 1L, "y", 0.0))
    val out = Sessions.topPaths(df, n = 2, k = 5).collect()
      .map(_.getString(0))
    assert(out.toSeq == Seq("y>x"))
  }

  test("rfm: recency from the data frontier, exact day boundary, " +
    "non-purchase events ignored") {
    val day = 86400000L
    val df = ev(
      (1L, 10L * day, 1L, "purchase", 10.0),      // frontier user: rec 0
      (2L, 10L * day - 1L, 2L, "purchase", 5.0),  // 1 ms short of a day
      (3L, 8L * day, 2L, "purchase", 7.0),
      (4L, 3L * day, 3L, "purchase", 2.0),        // rec 7 → warm? no: > 6
      (5L, 10L * day, 3L, "click", 99.0))         // ignored entirely
    val out = Sessions.rfm(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))).toMap
    assert(out(1L) == ((0L, 1L, 10.0, "active")))
    // 10*day − (10*day − 1) = 1 ms → integer-div day 0, not 1
    assert(out(2L)._1 == 0L && out(2L)._2 == 2L && out(2L)._3 == 12.0)
    assert(out(3L) == ((7L, 1L, 2.0, "dormant")))
    assert(!out.contains(5L) && out.size == 3)
  }

  test("attribution: window cap nulls stale touches; same-ts touch " +
    "credits; touches never emit") {
    val df = ev(
      (1L, 100L, 1L, "click", 0.0),
      (2L, 150L, 1L, "purchase", 0.0),   // gap 50 ≤ 100 → credited
      (3L, 300L, 1L, "purchase", 0.0),   // gap 200 > 100 → null
      (4L, 500L, 2L, "click", 0.0),
      (5L, 500L, 2L, "purchase", 0.0),   // same ts: touch orders first
      (6L, 700L, 3L, "purchase", 0.0))   // no touch ever → null
    val out = Sessions.attribution(df, "click", "purchase", windowMs = 100L)
      .collect().map(r => r.getLong(1) -> ((
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out == Map(
      2L -> ((1L, 50L)), 3L -> ((-1L, -1L)),
      5L -> ((4L, 0L)), 6L -> ((-1L, -1L))))
  }
}
