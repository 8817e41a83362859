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
}
