package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class DebugSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("observed passthrough re-emits unchanged and reports vitals") {
    val base = graft.core.SeriesOps.series(spark, "/root/testdata/sf0.001")
    val (obs, o) = Debug.observed(base, "series_scan")
    val n = obs.count()
    assert(n == base.count())
    val metrics = o.get
    assert(metrics("rows") == n)
    assert(metrics("null_values") == 0L)
    assert(metrics("min_ts").asInstanceOf[Long] <=
      metrics("max_ts").asInstanceOf[Long])
  }
}
