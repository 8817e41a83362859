package graft.dql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** The storage seam: the SAME DQL query runs against the testdata binding
  * and the date-partitioned production layout, returns identical rows, and
  * on the partitioned binding the timeframe prunes partitions before IO.
  */
class LayoutStoreSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var path: String = _
  private val dir = "/root/testdata/sf0.001"
  private val nowMs = 1706745600000L
  private val dql =
    "SELECT avg('purchase'.'3' BUCKET 'testdata', 1 h) " +
      "BETWEEN 1704412800000 AND 1704672000000" // Jan 5 .. Jan 8 (3 days)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    path = Files.createTempDirectory("graft-layout-store").toString
    graft.core.Layout.writeSeriesPartitioned(
      graft.core.SeriesOps.series(spark, dir), path)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("same DQL, same answers on both store bindings") {
    val a = Compiler.run(spark, new TestdataStore(dir), nowMs, dql)
      .orderBy("metric", "ts_ms").collect().toSeq
    val b = Compiler.run(spark, new LayoutStore(path), nowMs, dql)
      .orderBy("metric", "ts_ms").collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("the timeframe prunes partitions on the layout binding") {
    val df = Compiler.run(spark, new LayoutStore(path), nowMs, dql)
    df.count() // finalize AQE so the adaptive plan holds real scans
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case other => other.collect {
          case f: FileSourceScanExec => Seq(f)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scans(a.executedPlan)
        }.flatten
      }
    val counts = scans(df.queryExecution.executedPlan)
      .filter(_.partitionFilters.nonEmpty)
      .map(_.selectedPartitions.partitionCount)
    assert(counts.nonEmpty && counts.forall(_ == 3),
      s"expected 3-day pruned scans, got $counts")
  }
}
