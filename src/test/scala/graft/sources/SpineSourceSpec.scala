package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The DSv2 spine connector: correct slot generation, even partition
  * split, column pruning, and gap-fill composition against the series.
  */
class SpineSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def spine(s: Long, e: Long, step: Long, parts: Int) =
    spark.read.format("graft-spine")
      .option("startMs", s).option("endMs", e)
      .option("stepMs", step).option("numPartitions", parts).load()

  test("generates the exact slot set, distributed") {
    val df = spine(1000L, 11000L, 1000L, 4)
    assert(df.rdd.getNumPartitions == 4)
    val rows = df.orderBy("slot").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 10)
    assert(rows.head == (1000L, 0L) && rows.last == (10000L, 9L))
    assert(rows.map(_._1).toSeq ==
      (0 until 10).map(i => 1000L + i * 1000L))
  }

  test("ragged range rounds the slot count up") {
    assert(spine(0L, 2500L, 1000L, 2).count() == 3)
    assert(spine(0L, 0L, 1000L, 2).count() == 0)
  }

  test("column pruning reaches the reader") {
    val df = spine(0L, 5000L, 1000L, 2).select("slot")
    val scan = df.queryExecution.executedPlan.toString
    // the DSv2 scan's ReadSchema should carry only the pruned column
    assert(scan.contains("slot") && !scan.contains("ts_ms"))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("ts_ms range filters push into the generator (no filtered slots produced)") {
    val df = spine(0L, 86400000L, 1000L, 4) // a day of seconds
      .where(col("ts_ms") >= 3600000L && col("ts_ms") < 7200000L)
    // the scan's own description carries the NARROWED range — the
    // generator never produces the filtered-out slots
    val scanDesc = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scanDesc.contains("graft-spine [3600000, 7200000)"))
    // slot numbering stays anchored at the ORIGINAL start
    val slots = df.orderBy("slot").select("slot", "ts_ms").collect()
    assert(slots.head.getLong(0) == 3600L &&
      slots.head.getLong(1) == 3600000L)
    assert(df.count() == 3600)
  }

  test("gap-fill via the connector matches the spine-join form") {
    val dir = "/root/testdata/sf0.001"
    val (s, e) = (1704412800000L, 1704416400000L) // 1 h on 2024-01-05
    val ser = graft.core.SeriesOps.series(spark, dir)
      .where(col("mtype") === "purchase" && col("muser") < 5 &&
        col("ts_ms") >= s && col("ts_ms") < e)
    val catalog = ser.select("metric").distinct()
    val filled = spine(s, e, 1000L, 4).select("ts_ms")
      .crossJoin(broadcast(catalog))
      .join(ser.select("metric", "ts_ms", "value"), Seq("metric", "ts_ms"),
        "left")
    assert(filled.count() == 3600L * catalog.count())
    assert(filled.where(col("value").isNotNull).count() == ser.count())
  }
}
