package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Stream ≡ batch for sessionization: `session_window` state must land on
  * the batch lag/cumsum derivation bit-for-bit — including the exact-gap
  * boundary, cross-micro-batch session merging, and emit-once on
  * watermark close.
  */
class EventStreamSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val Gap = 1000L
  /** far enough that its window closes every real session */
  private val Sentinel = (999999000L, 999L, 0.0)

  /** replay (tsMs, user, value) batches through the stream sessionizer */
  private def stream(batches: Seq[(Long, Long, Double)]*)
      : Seq[(Long, Long, Long, Long, Double)] = {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)]
    val ev = in.toDF().toDF("tsMs", "user_id", "value")
      .withColumn("ts", timestamp_millis(col("tsMs")))
      .select("ts", "user_id", "value")
    val out = EventStream.sessionize(ev, Gap, "0 seconds")
    val name = s"sess_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    val res = spark.table(name)
      .where(col("session_start") < Sentinel._1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq.sorted
    q.stop()
    res
  }

  private def batch(rows: Seq[(Long, Long, Double)])
      : Seq[(Long, Long, Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    val ev = rows.zipWithIndex
      .map { case ((ts, u, v), i) => (i.toLong, ts, u, v) }
      .toDF("event_id", "ts_ms", "user_id", "value")
    graft.ops.Sessions.sessionize(ev, Gap).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toSeq.sorted
  }

  test("stream sessions equal batch sessions, including the gap boundary") {
    val rows = Seq(
      (0L, 1L, 1.0), (1000L, 1L, 2.0),  // exact gap → still merges
      (2001L, 1L, 4.0),                 // gap+1 → new session
      (0L, 2L, 1.0), (3000L, 2L, 8.0))  // clean split
    assert(stream(rows :+ Sentinel) == batch(rows))
  }

  test("sessions merge across micro-batches before the watermark closes them") {
    val b1 = Seq((0L, 1L, 1.0))
    val b2 = Seq((500L, 1L, 2.0))       // arrives in the next trigger
    val all = b1 ++ b2
    assert(stream(b1, b2, Seq(Sentinel)) == batch(all))
  }

  test("a session is emitted exactly once, at watermark close") {
    val out = stream(Seq((0L, 1L, 1.0)), Seq(Sentinel), Seq(Sentinel))
    assert(out == Seq((1L, 0L, 0L, 1L, 1.0)))
  }

  // ------------------------------------------------------------- funnel

  /** replay (tsMs, user, event_type) batches through the stream funnel,
    * returning the FINAL per-step counts (update mode re-emits a step's
    * row when its count changes; last write wins)
    */
  private def funnelStream(batches: Seq[(Long, Long, String)]*)
      : Map[(Long, String), Long] = {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String)]
    val ev = in.toDF().toDF("tsMs", "user_id", "event_type")
      .withColumn("ts", timestamp_millis(col("tsMs")))
      .select("ts", "user_id", "event_type")
    val out = EventStream.funnel(ev, Seq("view", "click"), "0 seconds")
    val name = s"funnel_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    val res = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap // update-mode sink: later rows for a key overwrite by toMap
    q.stop()
    res
  }

  test("funnel state carries across micro-batches; each step counts a user once") {
    val counts = funnelStream(
      Seq((10L, 1L, "view"), (10L, 2L, "click")),   // u1 step0; u2 nothing
      Seq((20L, 1L, "click"), (20L, 2L, "view"),    // u1 completes; u2 step0
        (30L, 1L, "click")))                        // u1 step1 again: no-op
    assert(counts == Map((0L, "view") -> 2L, (1L, "click") -> 1L))
  }

  test("online funnel cannot retract on cross-batch disorder (the stated contract)") {
    // view@30 then click@20 across batches: batch semantics would reject
    // (click precedes the recorded view); a later view@5 cannot rewind it
    val counts = funnelStream(
      Seq((30L, 1L, "view")),
      Seq((20L, 1L, "click"), (5L, 1L, "view")))
    assert(counts == Map((0L, "view") -> 1L))
  }

  test("funnelWithin online: the deadline blocks a too-late step") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String)]
    val ev = in.toDF().toDF("tsMs", "user_id", "event_type")
      .withColumn("ts", timestamp_millis(col("tsMs")))
      .select("ts", "user_id", "event_type")
    val out = EventStream.funnelWithin(ev, Seq("view", "click"),
      "0 seconds", windowMs = 50L)
    val name = s"fw_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    // u1 clicks ON the deadline (inclusive); u2 clicks one ms past it
    in.addData((0L, 1L, "view"), (50L, 1L, "click"),
      (0L, 2L, "view"), (51L, 2L, "click"))
    q.processAllAvailable()
    val res = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    q.stop()
    assert(res == Map((0L, "view") -> 2L, (1L, "click") -> 1L))
  }

  test("online actives: cross-batch duplicates dedup; coverage closes" +
    " with the target day") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val ev = in.toDF().toDF("tsMs", "user_id")
      .withColumn("ts", timestamp_millis(col("tsMs")))
      .select("ts", "user_id")
    val out = EventStream.windowActive(ev, dayMs = 10L, windowDays = 3)
    val name = s"act_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    // day indices start at 10, NOT 0: an event time equal to the
    // INITIAL watermark (epoch 0) is dropped as late by the dedup —
    // the at-the-boundary rule every watermark operator shares
    in.addData((100L, 1L), (105L, 1L))      // u1 day 10 (in-batch dup)
    q.processAllAvailable()
    in.addData((112L, 1L), (115L, 2L))      // day 11: u1's day-10
    q.processAllAvailable()                 // coverage spans 10–12, so
                                            // u1 dedups on 11 and 12
    in.addData((1000L, 9L))                 // sentinel closes everything
    q.processAllAvailable()
    val got = spark.table(name).where(col("day") < 100)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    q.stop()
    // coverage: u1 covers 10,11,12 (day 10) and 11,12,13 (day 11,
    // deduped on 11,12); u2 covers 11,12,13 → wau 1,2,2,2
    assert(got == Seq((10L, 1L), (11L, 2L), (12L, 2L), (13L, 2L)))
  }

  test("fused active board: per-tag counts equal the standalone " +
    "DAU/WAU halves") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val ev = in.toDF().toDF("tsMs", "user_id")
      .withColumn("ts", timestamp_millis(col("tsMs")))
      .select("ts", "user_id")
    val out = EventStream.activeBoard(ev, dayMs = 10L, windowDays = 3)
    val name = s"board_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    // same replay as the windowActive test, plus a second day-10 user
    in.addData((100L, 1L), (105L, 1L), (108L, 2L))
    q.processAllAvailable()
    in.addData((112L, 1L), (115L, 2L))
    q.processAllAvailable()
    in.addData((1000L, 9L)) // sentinel closes everything
    q.processAllAvailable()
    val got = spark.table(name).where(col("day") < 100)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    q.stop()
    // dau: day 10 = {u1,u2}, day 11 = {u1,u2}
    assert(got(("d", 10L)) == 2L && got(("d", 11L)) == 2L)
    // wau (3-day coverage): 10→{1,2}, 11→{1,2}, 12→{1,2}, 13→{1,2}
    assert(Seq(10L, 11L, 12L, 13L).forall(d => got(("w", d)) == 2L))
    // no stray tags/days below the sentinel
    assert(got.size == 6)
  }

  private def transStream(batches: Seq[(Long, Long, Long, String)]*)
      : Map[(String, String), Long] = {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)]
    val ev = in.toDF().toDF("tsMs", "user_id", "event_id", "event_type")
      .withColumn("ts", timestamp_millis(col("tsMs")))
      .select("ts", "user_id", "event_id", "event_type")
    val out = EventStream.transitions(ev, Gap, "0 seconds")
    val name = s"trans_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    val res = spark.table(name).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap // update-mode sink: later rows for a key overwrite by toMap
    q.stop()
    res
  }

  test("lag features: idx/gap carry across batches; first event nulls;" +
    " late arrivals drop") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)]
    val ev = in.toDF().toDF("tsMs", "user_id", "event_id", "event_type")
      .withColumn("ts", timestamp_millis(col("tsMs")))
      .select("ts", "user_id", "event_id", "event_type")
    val out = EventStream.lagFeatures(ev, "0 seconds")
    val name = s"feat_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData((0L, 1L, 100L, "a"), (10L, 1L, 101L, "b"))
    q.processAllAvailable()
    in.addData((25L, 1L, 102L, "c"), (5L, 1L, 103L, "x")) // 103 behind frontier
    q.processAllAvailable()
    val rows = spark.table(name).collect()
      .map(r => (r.getLong(1), (if (r.isNullAt(4)) null
        else r.getString(4), if (r.isNullAt(5)) -1L else r.getLong(5),
        r.getLong(6)))).toMap
    q.stop()
    assert(rows == Map(
      100L -> ((null, -1L, 1L)),     // first event: null prev/gap, idx 1
      101L -> (("a", 10L, 2L)),
      102L -> (("b", 15L, 3L))))     // cross-batch carry; 103 dropped
  }

  test("transitions: state carries across batches, gaps break chains," +
    " late arrivals drop") {
    val counts = transStream(
      Seq((0L, 1L, 1L, "a"), (10L, 1L, 2L, "b")),      // a→b
      Seq((20L, 1L, 3L, "c"),                          // b→c (cross-batch)
        (5000L, 1L, 4L, "d"),                          // gap > 1 s: no c→d
        (5010L, 1L, 5L, "a"),                          // d→a
        (5L, 1L, 6L, "x")))                            // behind frontier (10)
    assert(counts == Map(("a", "b") -> 1L, ("b", "c") -> 1L,
      ("d", "a") -> 1L))
  }

  test("transitions: per-user ts ties fold in event_id order and count," +
    " matching the batch tie transition") {
    // two events share ts 10 — the batch windows order them by
    // (ts_ms, event_id) and count x→y; a ts-only frontier used to drop
    // the second one. A tie arriving in a LATER batch at the frontier
    // ts but a higher event_id must also fold (cross-batch tie carry).
    val counts = transStream(
      Seq((0L, 1L, 1L, "a"), (10L, 1L, 2L, "x"), (10L, 1L, 3L, "y")),
      Seq((10L, 1L, 4L, "z"),                          // frontier-ts tie
        (10L, 1L, 3L, "dup")))                         // at/behind (10,3): drop
    assert(counts == Map(("a", "x") -> 1L, ("x", "y") -> 1L,
      ("y", "z") -> 1L))
  }

  test("lag features: ts ties count with gap 0 in event_id order") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)]
    val ev = in.toDF().toDF("tsMs", "user_id", "event_id", "event_type")
      .withColumn("ts", timestamp_millis(col("tsMs")))
      .select("ts", "user_id", "event_id", "event_type")
    val out = EventStream.lagFeatures(ev, "0 seconds")
    val name = s"feat_tie_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData((10L, 1L, 100L, "a"), (10L, 1L, 101L, "b"))
    q.processAllAvailable()
    in.addData((10L, 1L, 102L, "c"), (10L, 1L, 101L, "dup"))
    q.processAllAvailable()
    val rows = spark.table(name).collect()
      .map(r => (r.getLong(1), (if (r.isNullAt(4)) null
        else r.getString(4), if (r.isNullAt(5)) -1L else r.getLong(5),
        r.getLong(6)))).toMap
    q.stop()
    assert(rows == Map(
      100L -> ((null, -1L, 1L)),
      101L -> (("a", 0L, 2L)),       // tie: counted, gap 0
      102L -> (("b", 0L, 3L))))      // cross-batch frontier-ts tie folds
  }
}
