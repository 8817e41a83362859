package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for local iteration — not part of the library surface.
  * Currently: drives core.Layout on disk and probes the midnight
  * partition boundary.
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // driver smoke: entry() on this fresh session (no custom confs) must
    // return rows — covers the nanosAsLong self-configuration too
    println(s"[dev] entry() rows=${SparkEntry.entry(spark).count()}")
    val path = java.nio.file.Files.createTempDirectory("graft-dev-layout").toString
    graft.core.Layout.writeSeriesPartitioned(
      graft.core.SeriesOps.series(spark, "/root/testdata/sf0.001"), path)
    val dts = new java.io.File(path).list().count(_.startsWith("dt="))
    println(s"[dev] partitions=$dts")
    // range ending exactly at midnight: [Jan05, Jan06) must touch ONE day
    val scan = graft.core.Layout.rangeScan(spark, path,
      1704412800000L, 1704499200000L)
    val parts = scan.queryExecution.executedPlan.toString()
    val prunedToOneDay = parts.contains("dt#") // PartitionFilters present
    println(s"[dev] boundary rows=${scan.count()} partitionFilters=$prunedToOneDay")
    val expect = graft.core.SeriesOps.series(spark, "/root/testdata/sf0.001")
      .where(org.apache.spark.sql.functions.col("ts_ms") >= 1704412800000L &&
        org.apache.spark.sql.functions.col("ts_ms") < 1704499200000L).count()
    println(s"[dev] unpartitioned-expect=$expect match=${expect == scan.count()}")
    // the authoritative pruning signal: the scan node's selected partitions
    scan.queryExecution.executedPlan.collectLeaves().foreach {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        println(s"[dev] selectedPartitions=${f.selectedPartitions.partitionCount} " +
          s"partitionFilters=${f.partitionFilters.mkString(";")}")
      case _ =>
    }
    // error path: EVENTS query against the metrics-only layout binding
    try {
      Graft.query(spark, new graft.dql.LayoutStore(path),
        "SELECT EVENTS FROM 'testdata' LAST 1 d", nowMs = 1704499200000L)
      println("[dev] events-on-layout: NO ERROR (unexpected)")
    } catch {
      case e: UnsupportedOperationException =>
        println(s"[dev] events-on-layout rejected cleanly: ${e.getMessage}")
    }
    spark.stop()
  }
}
