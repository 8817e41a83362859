package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The sketch must honor HDR's error contract: quantiles within one
  * sub-bucket (relative error ≤ 10^-sf) of the exact order statistic,
  * mergeable across partitions.
  */
class HdrHistogramSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucket index math: equivalent ranges grow exponentially") {
    val l = new HdrHistogram.Layout(2)
    // low values: exact (sub-bucket width 1)
    assert(l.highestEquivalent(l.indexOf(7)) == 7)
    assert(l.highestEquivalent(l.indexOf(200)) == 200)
    // high values: within relative 10^-2
    val v = 1234567L
    val he = l.highestEquivalent(l.indexOf(v))
    assert(he >= v && (he - v).toDouble / v <= 0.01)
  }

  test("p-quantiles within HDR error bound vs exact, across partitions") {
    val rnd = new scala.util.Random(3)
    val values = (1 to 20000).map(_ =>
      math.abs(rnd.nextGaussian() * 50000).toLong + 1)
    val df = spark.createDataFrame(values.map(Tuple1(_))).toDF("v")
      .repartition(4) // force partial-aggregate merges
    for (p <- Seq(0.5, 0.9, 0.99); sf <- Seq(2, 3)) {
      val sketch = df.agg(
        HdrHistogram.hdrPercentile(sf, p)(col("v"))).head().getDouble(0)
      val exact = values.sorted.apply(
        math.max(1, math.ceil(p * values.length).toInt) - 1).toDouble
      val relErr = math.abs(sketch - exact) / exact
      assert(relErr <= math.pow(10, -sf) * 2,
        s"p=$p sf=$sf sketch=$sketch exact=$exact relErr=$relErr")
    }
  }

  test("reference range semantics: negatives and values above htv are " +
    "DROPPED, never clamped into the sketch") {
    // reference behavior (dqe_hist.erl insert path, quoted in
    // dql/Compiler.scala): out-of-range values never enter the histogram
    // or its total. The previous clamp counted phantom zeros: p50 over
    // [-5,-5,-5,10] read 0 instead of 10 for standalone Aggregator users
    // (the DQL gates pre-filter and never saw it).
    val df = spark.createDataFrame(
      Seq(-5L, -5L, -5L, 10L).map(Tuple1(_))).toDF("v")
    val p50 = df.agg(HdrHistogram.hdrPercentile(2, 0.5)(col("v")))
      .head().getDouble(0)
    assert(p50 == 10.0, s"negatives must be dropped, got p50=$p50")
    // htv ceiling: values above it are dropped the same way
    val df2 = spark.createDataFrame(
      Seq(1L, 2L, 3L, 1000000L).map(Tuple1(_))).toDF("v")
    val p99 = df2.agg(
      HdrHistogram.hdrPercentile(2, 0.99, htv = 100L)(col("v")))
      .head().getDouble(0)
    assert(p99 == 3.0, s"values above htv must be dropped, got p99=$p99")
    // all-dropped input → NaN (empty-sketch convention)
    val p = spark.createDataFrame(Seq(-1L).map(Tuple1(_))).toDF("v")
      .agg(HdrHistogram.hdrPercentile(2, 0.5)(col("v")))
      .head().getDouble(0)
    assert(p.isNaN)
  }
}
