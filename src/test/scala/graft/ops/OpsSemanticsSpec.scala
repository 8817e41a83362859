package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins for the reference's subtle operator semantics (SURVEY §7.3) —
  * the behaviors easiest to "simplify" into something wrong.
  */
class OpsSemanticsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def series(rows: (String, Long, Double)*) =
    spark.createDataFrame(rows).toDF("metric", "ts_ms", "value")

  test("diff folds first-minus-rest in argument order (dqe_diff_comb)") {
    val df = series(("a", 0L, 10.0), ("b", 0L, 3.0), ("c", 0L, 2.0))
    val r = Combs.combine(df, Seq("a", "b", "c"), "diff")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(r.toSeq == Seq((0L, 5.0)))
    // reversed order gives a different answer — must NOT be commuted
    val rev = Combs.combine(df, Seq("c", "b", "a"), "diff")
      .collect().map(_.getDouble(1))
    assert(rev.toSeq == Seq(-11.0))
  }

  test("quotient treats division by zero as division by one (dqe_quotient_comb:28-31)") {
    val df = series(("a", 0L, 12.0), ("b", 0L, 0.0), ("c", 0L, 4.0))
    val r = Combs.combine(df, Seq("a", "b", "c"), "quotient")
      .collect().map(_.getDouble(1))
    assert(r.toSeq == Seq(3.0)) // 12 ⊘ 0 → 12, then / 4 → 3
  }

  test("order-sensitive combinators yield NULL when an operand is absent") {
    val df = series(("a", 0L, 10.0), ("b", 0L, 3.0),
      ("a", 1L, 7.0)) // 'b' missing at ts=1
    val r = Combs.combine(df, Seq("a", "b"), "product")
      .orderBy("ts_ms").collect()
    assert(r(0).getDouble(1) == 30.0)
    assert(r(1).isNullAt(1))
  }

  test("signed scale transforms: f(-n) = -f(n), f(0) = 0 (sqrt/log10)") {
    val sq = Trans.spark("sqrt_scale", None)
    val lg = Trans.spark("log10_scale", None)
    val df = spark.createDataFrame(Seq(Tuple1(-4.0), Tuple1(0.0), Tuple1(4.0),
      Tuple1(-100.0), Tuple1(100.0))).toDF("v")
    val out = df.select(sq(col("v")).as("s"), lg(col("v")).as("l"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(out(0)._1 == -2.0 && out(2)._1 == 2.0 && out(1)._1 == 0.0)
    assert(out(3)._2 == -2.0 && out(4)._2 == 2.0 && out(1)._2 == 0.0)
  }

  test("derivate keeps length: first point backfilled with second diff") {
    val df = series(("m", 0L, 1.0), ("m", 1L, 4.0), ("m", 2L, 9.0))
      .withColumn("mtype", lit("t")).withColumn("muser", lit(0L))
    val r = Trans.derivate(df).orderBy("ts_ms")
      .select("value").collect().map(_.getDouble(0))
    assert(r.toSeq == Seq(3.0, 3.0, 5.0)) // v'(0) = v'(1)
  }

  test("exact percentile survives a 1M-point window (max_read envelope) at default memory") {
    // the reference's read envelope allows 1.2M points in one window; the
    // exact k-th-smallest collects the window into one finishing task —
    // this pins that the O(window) buffer fits without raised driver memory
    val agg = Aggrs.spark("percentile", Some(0.9))
    val n = 1000000L
    val df = spark.range(n).selectExpr("'m' AS metric", "id AS ts_ms",
      // deterministic non-monotonic values so the sort does real work
      "CAST((id * 1103515245 + 12345) % 1000003 AS DOUBLE) AS value")
    val r = df.groupBy("metric")
      .agg(agg(col("value"), col("ts_ms")).as("v"))
      .collect().head.getDouble(1)
    // oracle: k-th smallest of ((i*1103515245+12345) mod 1000003), k = ceil(0.9 * n)
    val expect = (0L until n).map(i => (i * 1103515245L + 12345L) % 1000003L)
      .sorted.apply((math.ceil(0.9 * n).toLong - 1).toInt).toDouble
    assert(r == expect)
  }

  test("percentile group beyond the row bound raises a descriptive " +
    "error, never an opaque OOM") {
    // adversarial misuse: a group 4x the (test-sized) bound must fail
    // LOUDLY with the bound named — the 100x-window backstop
    val df = spark.range(40L).selectExpr("'m' AS metric",
      "id AS ts_ms", "CAST(id AS DOUBLE) AS value")
    val e = intercept[Exception] {
      df.groupBy("metric")
        .agg(Aggrs.kthBounded(col("value"), 0.5, bound = 10).as("v"))
        .collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("KthGroupRowBound"), msg.take(500))
    // and at the bound exactly, the exact rank still computes
    val ok = df.groupBy("metric")
      .agg(Aggrs.kthBounded(col("value"), 0.5, bound = 40).as("v"))
      .collect().head.getDouble(1)
    assert(ok == 19.0)
  }

  test("windowed min_by threshold ops pick the first qualifying value in time order") {
    val agg = Aggrs.spark("first_above", Some(5.0))
    val df = series(("m", 3L, 9.0), ("m", 1L, 2.0), ("m", 2L, 7.0))
    val r = df.groupBy("metric")
      .agg(agg(col("value"), col("ts_ms")).as("v"))
      .collect().head.getDouble(1)
    assert(r == 7.0) // ts=2 is the first point above 5, despite ts=3 arriving first
  }
}
