package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.sql.Timestamp

/** The full lifecycle loop: event stream → streaming slot aggregation →
  * dt-partitioned layout on disk → batch DQL query over the LayoutStore
  * binding, with partition pruning. (The reference cannot do this at all:
  * ingestion lives outside its engine.)
  */
class SeriesIngestSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  // 2024-01-05T00:00:00Z, matching the testdata era
  private val Base = 1704412800L
  private def ev(sec: Long, t: String, u: Long, v: Double) =
    SeriesStream.Ev(new Timestamp((Base + sec) * 1000), t, u, v)

  test("ingest -> layout -> batch DQL with pruning") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest")
    val path = dir.resolve("series").toString
    val ckpt = dir.resolve("ckpt").toString

    val in = MemoryStream[SeriesStream.Ev]
    val q = SeriesIngest.start(in.toDF(), path, ckpt, watermark = "5 seconds")
    // two points in one slot (mean 2.0), one in another slot, one next day
    in.addData(ev(0, "purchase", 1, 1.0), ev(0, "purchase", 1, 3.0),
      ev(2, "purchase", 1, 7.0), ev(86400, "purchase", 1, 9.0))
    q.processAllAvailable()
    // advance the watermark past every open slot so append emits them
    in.addData(ev(86500, "click", 9, 0.0))
    q.processAllAvailable()
    q.stop()

    // the layout on disk: dt-partitioned, readable by the batch reader
    val stored = graft.core.Layout.rangeScan(spark, path,
      Base * 1000, (Base + 10) * 1000)
      .select("metric", "ts_ms", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stored == Set(
      ("purchase.1", Base * 1000, 2.0),
      ("purchase.1", (Base + 2) * 1000, 7.0)))

    // batch DQL over the ingested layout (LayoutStore binding)
    val out = graft.Graft.query(spark, new graft.dql.LayoutStore(path),
      s"SELECT sum('purchase'.'1' BUCKET 'testdata', 10 s) " +
        s"AFTER ${Base * 1000} FOR 10 s",
      nowMs = (Base + 86600) * 1000)
    val rows = out.collect().map(r =>
      (r.getAs[Long]("ts_ms"), r.getAs[Double]("value")))
    assert(rows.toSeq == Seq((Base * 1000, 9.0))) // 2.0 + 7.0 in the window
  }
}
