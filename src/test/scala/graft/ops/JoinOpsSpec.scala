package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.{AsofJoin, RangeJoin}

/** Semantics of the join-operator extensions (as-of, range) against
  * hand-computable frames, plus plan-shape assertions: the as-of join must
  * plan as ONE exchange (no nested loop), the range join as an equi-join
  * (SortMerge/Hash), never a cartesian/BNL.
  */
class JoinOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def leftDf = {
    val s = spark; import s.implicits._
    Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 50L, 5.0),
      (2L, 100L, 1.0)).toDF("k", "ts_ms", "value")
  }
  private def rightDf = {
    val s = spark; import s.implicits._
    // k=1: points at 60 and 200 (exact-tie case); k=2: none before 100
    Seq((1L, 60L, 6.5), (1L, 200L, 7.5), (2L, 150L, 9.9))
      .toDF("k", "ts_ms", "value")
  }

  test("asof: greatest right ts <= left ts, per key; null when none") {
    val out = AsofJoin.asof(leftDf, rightDf, Seq("k"), "ts_ms", "value",
      "rv").orderBy("k", "ts_ms").collect()
    val got = out.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq == Seq(
      (1L, 50L, None),          // nothing at or before 50
      (1L, 100L, Some(6.5)),    // 60 is the latest <= 100
      (1L, 200L, Some(7.5)),    // inclusive: right at exactly 200 wins
      (2L, 100L, None)))        // k=2 right point is later
  }

  test("asofTolerance: stale matches null out; boundary is inclusive") {
    // tolerance 40: k=1 ts=100 matched at 60 → age 40, exactly ON the
    // bound, kept; ts=200 matched at 200 → age 0, kept. tolerance 39:
    // the age-40 match drops, the age-0 match survives.
    val kept = AsofJoin.asofTolerance(leftDf, rightDf, Seq("k"), "ts_ms",
      "value", "rv", toleranceMs = 40L).orderBy("k", "ts_ms").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(kept.toSeq == Seq(None, Some(6.5), Some(7.5), None))
    val tight = AsofJoin.asofTolerance(leftDf, rightDf, Seq("k"), "ts_ms",
      "value", "rv", toleranceMs = 39L).orderBy("k", "ts_ms").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(tight.toSeq == Seq(None, None, Some(7.5), None))
  }

  test("asofForward: smallest right ts >= left ts, inclusive at equality") {
    val out = AsofJoin.asofForward(leftDf, rightDf, Seq("k"), "ts_ms",
      "value", "rv").orderBy("k", "ts_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq == Seq(
      (1L, 50L, Some(6.5)),     // next at 60
      (1L, 100L, Some(7.5)),    // next at 200
      (1L, 200L, Some(7.5)),    // inclusive: right at exactly 200
      (2L, 100L, Some(9.9))))   // k=2 right point at 150 is ahead
  }

  test("asof: plans without BroadcastNestedLoop/Cartesian") {
    val plan = AsofJoin.asof(leftDf, rightDf, Seq("k"), "ts_ms", "value",
      "rv").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"))
  }

  test("range: containment matches, chunk bucketing invisible") {
    val s = spark; import s.implicits._
    val pts = Seq((1L, 5L, 1.0), (1L, 15L, 2.0), (1L, 25L, 3.0),
      (2L, 15L, 4.0)).toDF("k", "ts_ms", "v")
    val ivals = Seq((1L, 10L, 20L, "a"), (1L, 14L, 30L, "b"),
      (2L, 0L, 10L, "c")).toDF("k", "lo", "hi", "tag")
    val out = RangeJoin.join(pts, ivals, Seq("k"), "ts_ms", "lo", "hi",
      chunkMs = 10L)
      .select("k", "ts_ms", "tag").as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 15L, "a"), (1L, 15L, "b"), (1L, 25L, "b")))
  }

  test("range: plans as equi-join on the chunk key, not BNL") {
    val s = spark; import s.implicits._
    val pts = Seq((1L, 5L, 1.0)).toDF("k", "ts_ms", "v")
    val ivals = Seq((1L, 0L, 10L, "a")).toDF("k", "lo", "hi", "tag")
    val plan = RangeJoin.join(pts, ivals, Seq("k"), "ts_ms", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"))
  }
}
