package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.sql.Timestamp

/** The stream-store seam (StreamStore.scala): an ALTERNATE event schema —
  * telemetry readings shaped (event_time, service, host, reading) with
  * tags `svc`/`host` — runs tag WHERE, GROUP BY $tag USING, and dvar
  * naming through the UNCHANGED streaming compiler, exactly as the batch
  * compiler runs against any SeriesStore binding. The default
  * TestdataStreamStore path keeps its own coverage in StreamingDqlSpec.
  */
class StreamStoreSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  /** alternate raw-event shape: none of the testdata column names */
  case class Reading(event_time: Timestamp, service: String, host: String,
                     reading: Double)

  object TelemetryStore extends StreamStore {
    val tsCol = "event_time"
    val valueCol = "reading"
    val keyCols: Seq[String] = Seq("service", "host")
    def tagCol(ns: String, key: String): Option[String] = key match {
      case "svc"  => Some("service")
      case "host" => Some("host")
      case _      => None
    }
  }

  private def rd(sec: Long, svc: String = "api", host: String = "h1",
                 v: Double = 10.0) =
    Reading(new Timestamp(sec * 1000), svc, host, v)

  private def run(dql: String, data: Seq[Reading], name: String,
                  cols: String = "metric, ws, CAST(value AS DOUBLE) AS value")
      : Array[Seq[Any]] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[Reading]
    val out = StreamingDql.compile(in.toDF(), dql, "30 seconds",
      TelemetryStore)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    in.addData(data: _*)
    q.processAllAvailable()
    val rows = spark.sql(s"SELECT $cols FROM $name ORDER BY metric, ws")
      .collect().map(_.toSeq)
    q.stop()
    rows
  }

  private def withConf[A](key: String, value: String)(body: => A): A = {
    spark.conf.set(key, value)
    try body finally spark.conf.unset(key)
  }

  test("glob scan + windowed avg against the alternate schema") {
    withConf("spark.graft.streaming.slotExact", "false") {
      val rows = run("SELECT avg('api'.* BUCKET 'telemetry', 1 m) LAST 1 h",
        Seq(rd(0, v = 1), rd(10, v = 3), rd(70, v = 5),
          rd(10, svc = "db", v = 9)), "alt_avg")
      assert(rows.toSeq == Seq(
        Seq("api.h1", 0L, 2.0), Seq("api.h1", 60000L, 5.0)))
    }
  }

  test("tag WHERE filters on the store's tag map") {
    withConf("spark.graft.streaming.slotExact", "false") {
      val rows = run(
        "SELECT avg('api' FROM 'telemetry' WHERE 'graft':'host' = 'h2', 1 m) " +
          "LAST 1 h",
        Seq(rd(0, v = 1), rd(10, host = "h2", v = 3),
          rd(20, host = "h2", v = 5)), "alt_where")
      assert(rows.toSeq == Seq(Seq("api.h2", 0L, 4.0)))
    }
  }

  test("GROUP BY $tag USING avg groups on the bound tag column") {
    withConf("spark.graft.streaming.slotExact", "false") {
      // per-slot cross-series combine keyed on service: slot 0 s has
      // api {1, 3} (avg 2) and db {8}; different slots stay separate rows
      val rows = run(
        "SELECT ALL FROM 'telemetry' GROUP BY $'graft':'svc' USING avg " +
          "LAST 1 h",
        Seq(rd(0, v = 1), rd(0, host = "h2", v = 3), rd(0, svc = "db", v = 8),
          rd(1, v = 7)), "alt_group")
      assert(rows.toSeq == Seq(
        Seq("api", 0L, 2.0), Seq("api", 1000L, 7.0), Seq("db", 0L, 8.0)))
    }
  }

  test("dvar naming reads the tag's key segment; unmapped tags name empty") {
    withConf("spark.graft.streaming.slotExact", "false") {
      val rows = run(
        "SELECT avg('api'.* BUCKET 'telemetry', 1 m) " +
          "AS 'lat'.$'graft':'host'.$'graft':'rack' LAST 1 h",
        Seq(rd(0, v = 1), rd(10, host = "h2", v = 3)), "alt_name",
        cols = "name, metric")
      // host is keyCols(1) → segment 2; 'rack' is unmapped → empty segment
      // (concat_ws keeps empty parts, so the trailing dot stays — the same
      // rendering the batch compiler's lit("") missing-tag branch emits)
      assert(rows.toSeq == Seq(
        Seq("lat.h1.", "api.h1"), Seq("lat.h2.", "api.h2")))
    }
  }

  test("dvar naming by a NON-KEY-mapped tag is refused, not silently empty") {
    // a store may map a tag to a column outside keyCols (legal for WHERE,
    // which filters the raw stream) — but only key segments survive the
    // windowed aggregation, so naming by such a tag must be a typed
    // refusal where the batch compiler would substitute the value
    object RackStore extends StreamStore {
      val tsCol = "event_time"
      val valueCol = "reading"
      val keyCols: Seq[String] = Seq("service")
      def tagCol(ns: String, key: String): Option[String] = key match {
        case "svc"  => Some("service")
        case "rack" => Some("host") // host exists but is not a key col
        case _      => None
      }
      override def tagColumns: Seq[String] = Seq("service", "host")
    }
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[Reading]
    val e = intercept[StreamingDql.Unstreamable] {
      StreamingDql.compile(in.toDF(),
        "SELECT avg('api'.* BUCKET 'telemetry', 1 m) " +
          "AS $'graft':'rack' LAST 1 h", "30 seconds", RackStore)
    }
    assert(e.getMessage.contains("non-key column 'host'"), e.getMessage)
  }

  test("slot collapse runs on the alternate schema (append, default slot-exact)") {
    // two readings inside one 1 s slot collapse to their davg before the
    // window aggregation — the chained shape carries the store's key
    // columns through the collapse
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[Reading]
    val out = StreamingDql.compile(in.toDF(),
      "SELECT avg('api'.'h1' BUCKET 'telemetry', 1 m) LAST 1 h",
      "0 seconds", TelemetryStore)
    val q = out.writeStream.format("memory").queryName("alt_slots")
      .outputMode("append").start()
    in.addData(rd(0, v = 1), rd(0, v = 3), rd(10, v = 6))
    in.addData(rd(200, v = 0)) // sentinel: closes [0, 60 s)
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT metric, ws, CAST(value AS DOUBLE) FROM alt_slots WHERE ws < 60000")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    assert(rows.toSeq == Seq(("api.h1", 0L, 4.0)))
  }
}
