package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.sql.Timestamp

/** The same DQL text the batch compiler runs, executed as a Structured
  * Streaming query through MemoryStream.
  */
class StreamingDqlSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def ev(sec: Long, t: String = "purchase", u: Long = 1,
                 v: Double = 10.0) =
    SeriesStream.Ev(new Timestamp(sec * 1000), t, u, v)

  private def run(dql: String, data: Seq[SeriesStream.Ev],
                  name: String): Array[(String, Long, Double)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[SeriesStream.Ev]
    val out = StreamingDql.compile(in.toDF(), dql, "30 seconds")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    in.addData(data: _*)
    q.processAllAvailable()
    val rows = spark.sql(s"SELECT metric, ws, CAST(value AS DOUBLE) AS value FROM $name " +
      "ORDER BY metric, ws").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    rows
  }

  test("windowed avg of a glob selector runs as a stream") {
    val rows = run("SELECT avg('purchase'.* BUCKET 'testdata', 1 m) LAST 1 h",
      Seq(ev(0, v = 1), ev(10, v = 3), ev(70, v = 5),
        ev(10, t = "error", v = 9)), "sdql_avg")
    assert(rows.toSeq == Seq(
      ("purchase.1", 0L, 2.0), ("purchase.1", 60000L, 5.0)))
  }

  test("transform above the aggregation projects the agg stream") {
    val rows = run(
      "SELECT add(sum('purchase'.'1' BUCKET 'testdata', 1 m), 100) LAST 1 h",
      Seq(ev(0, v = 1), ev(10, v = 3)), "sdql_add")
    assert(rows.toSeq == Seq(("purchase.1", 0L, 104.0)))
  }

  test("threshold aggregates stream too") {
    val rows = run(
      "SELECT count_above('purchase'.* BUCKET 'testdata', 2, 1 m) LAST 1 h",
      Seq(ev(0, v = 1), ev(10, v = 3), ev(20, v = 7)), "sdql_ca")
    assert(rows.toSeq == Seq(("purchase.1", 0L, 2.0)))
  }

  test("unstreamable shapes fail with clear errors") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[SeriesStream.Ev]
    intercept[StreamingDql.Unstreamable] {
      StreamingDql.compile(in.toDF(),
        "SELECT derivate(avg('purchase'.* BUCKET 'testdata', 1 m)) LAST 1 h",
        "30 seconds")
    }
    intercept[StreamingDql.Unstreamable] {
      StreamingDql.compile(in.toDF(),
        "SELECT avg('purchase'.* BUCKET 'testdata', 1 m) LAST 1 h TOP 2 BY avg()",
        "30 seconds")
    }
  }
}
