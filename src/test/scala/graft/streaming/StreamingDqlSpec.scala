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
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
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

  test("same-window combinator fuses into one stateful operator") {
    // quotient of two windowed avgs: purchase.1 avg 2.0, purchase.2 avg 8.0
    // in window 0; only purchase.1 present in window 60 (null divisor
    // propagates per the batch pivot semantics)
    val rows = run(
      "SELECT avg('purchase'.'1' BUCKET 'testdata', 1 m) / " +
        "avg('purchase'.'2' BUCKET 'testdata', 1 m) LAST 1 h",
      Seq(ev(0, v = 1), ev(10, v = 3), ev(5, u = 2, v = 8), ev(70, v = 5)),
      "sdql_comb")
    val byWs = rows.map(r => r._2 -> r._1).toMap
    assert(byWs == Map(0L -> "quotient", 60000L -> "quotient"))
    val vals = rows.map(r => r._2 -> r._3).toMap
    assert(vals(0L) == 0.25)
    assert(vals(60000L).isNaN) // null divisor propagates (batch pivot parity)
    // the plan has exactly ONE stateful aggregate (fused), not a union of
    // streaming aggregations
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[SeriesStream.Ev]
    val plan = StreamingDql.compile(in.toDF(),
      "SELECT avg('purchase'.'1' BUCKET 'testdata', 1 m) + " +
        "avg('purchase'.'2' BUCKET 'testdata', 1 m) LAST 1 h",
      "30 seconds").queryExecution.analyzed.toString()
    assert("Aggregate".r.findAllIn(plan).size == 1, plan.take(2000))
  }

  test("sum combinator skips absent children like the batch union") {
    val rows = run(
      "SELECT avg('purchase'.'1' BUCKET 'testdata', 1 m) + " +
        "avg('purchase'.'2' BUCKET 'testdata', 1 m) LAST 1 h",
      Seq(ev(0, v = 1), ev(10, v = 3), ev(5, u = 2, v = 8), ev(70, v = 5)),
      "sdql_comb_sum")
    val vals = rows.map(r => r._2 -> r._3).toMap
    assert(vals == Map(0L -> 10.0, 60000L -> 5.0)) // w60: only child 1 present
  }

  test("unstreamable shapes fail with clear errors") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[SeriesStream.Ev]
    intercept[StreamingDql.Unstreamable] {
      // derivate ABOVE an aggregation streams (keyed state); BELOW one it
      // still needs the ordered per-series raw scan
      StreamingDql.compile(in.toDF(),
        "SELECT avg(derivate('purchase'.'1' BUCKET 'testdata'), 1 m) LAST 1 h",
        "30 seconds")
    }
    intercept[StreamingDql.Unstreamable] {
      StreamingDql.compile(in.toDF(),
        "SELECT avg('purchase'.* BUCKET 'testdata', 1 m) LAST 1 h TOP 2 BY avg()",
        "30 seconds")
    }
  }
}
