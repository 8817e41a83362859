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

  /** run `dql` over one replayed batch. Update mode supports a single
    * stateful operator only, so these shapes pin `slotExact=false` (raw
    * events are one-per-slot in every fixture here, where the collapse is
    * the identity anyway); the slot-exact chained path is exercised by the
    * append-mode tests below and by StreamBatchEquivalenceSpec.
    */
  private def run(dql: String, data: Seq[SeriesStream.Ev],
                  name: String): Array[(String, Long, Double)] =
    withConf("spark.graft.streaming.slotExact", "false") {
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

  private def withConf[A](key: String, value: String)(body: => A): A = {
    spark.conf.set(key, value)
    try body finally spark.conf.unset(key)
  }

  test("TOP n BY fun runs as a complete-mode leader board behind the flag") {
    withConf("spark.graft.streaming.top.board", "true") {
      withConf("spark.graft.streaming.slotExact", "false") {
        val s = spark
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val in = MemoryStream[SeriesStream.Ev]
        val out = StreamingDql.compile(in.toDF(),
          "SELECT 'purchase'.* BUCKET 'testdata' LAST 1 h TOP 2 BY avg()",
          "30 seconds")
        val q = out.writeStream.format("memory").queryName("sdql_board")
          .outputMode("complete").start()
        // series means: u1 -> 2.0, u2 -> 9.0, u3 -> 5.0; top 2 = u2, u3
        in.addData(ev(0, u = 1, v = 1), ev(10, u = 1, v = 3),
          ev(5, u = 2, v = 9), ev(20, u = 3, v = 5),
          ev(30, t = "error", u = 9, v = 99))
        q.processAllAvailable()
        val rows = spark.sql(
          "SELECT metric, ws, CAST(value AS DOUBLE) FROM sdql_board")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
          .toSet
        q.stop()
        assert(rows == Set(("purchase.2", 5000L, 9.0),
          ("purchase.3", 20000L, 5.0)))
        // the board updates as the stream moves: u1's mean overtakes u3's
        val q2 = out.writeStream.format("memory").queryName("sdql_board2")
          .outputMode("complete").start()
        in.addData(ev(40, u = 1, v = 20))
        q2.processAllAvailable()
        val rows2 = spark.sql(
          "SELECT metric, CAST(value AS DOUBLE) FROM sdql_board2")
          .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
        q2.stop()
        assert(rows2 == Set(("purchase.2", 9.0), ("purchase.1", 8.0)))
      }
    }
  }

  test("TOP/BOTTOM rejections stay typed: no flag, non-algebraic score, " +
    "slot-exact") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[SeriesStream.Ev]
    val top = "SELECT 'purchase'.* BUCKET 'testdata' LAST 1 h TOP 2 BY avg()"
    intercept[StreamingDql.Unstreamable] {
      StreamingDql.compile(in.toDF(), top, "30 seconds")
    }
    withConf("spark.graft.streaming.top.board", "true") {
      // slot-exact (default) would chain two stateful aggs
      intercept[StreamingDql.Unstreamable] {
        StreamingDql.compile(in.toDF(), top, "30 seconds")
      }
      withConf("spark.graft.streaming.slotExact", "false") {
        intercept[StreamingDql.Unstreamable] {
          StreamingDql.compile(in.toDF(),
            "SELECT 'purchase'.* BUCKET 'testdata' LAST 1 h TOP 2 BY median()",
            "30 seconds")
        }
        intercept[StreamingDql.Unstreamable] {
          StreamingDql.compile(in.toDF(),
            "SELECT avg('purchase'.* BUCKET 'testdata', 1 m) LAST 1 h TOP 2 BY avg()",
            "30 seconds")
        }
      }
    }
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
    // streaming aggregations — plus the slot-collapse stage when the
    // default slot-exact mode is on (and only then)
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[SeriesStream.Ev]
    def planOf(): String = StreamingDql.compile(in.toDF(),
      "SELECT avg('purchase'.'1' BUCKET 'testdata', 1 m) + " +
        "avg('purchase'.'2' BUCKET 'testdata', 1 m) LAST 1 h",
      "30 seconds").queryExecution.analyzed.toString()
    val fused = withConf("spark.graft.streaming.slotExact", "false")(planOf())
    assert("Aggregate".r.findAllIn(fused).size == 1, fused.take(2000))
    val chained = planOf() // default: slot collapse below the fused agg
    assert("Aggregate".r.findAllIn(chained).size == 2, chained.take(2000))
  }

  test("nested aggregation chains exactly three stateful aggregates " +
    "(collapse, inner window, outer window)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[SeriesStream.Ev]
    def planOf(): String = StreamingDql.compile(in.toDF(),
      "SELECT sum(avg('purchase'.* BUCKET 'testdata', 1 m), 5 m) LAST 1 h",
      "30 seconds").queryExecution.analyzed.toString()
    // default slot-exact: collapse + inner + outer; without the
    // collapse: inner + outer
    assert("Aggregate".r.findAllIn(planOf()).size == 3)
    val lean = withConf("spark.graft.streaming.slotExact", "false")(planOf())
    assert("Aggregate".r.findAllIn(lean).size == 2, lean.take(2000))
    // nested derivate stays typed-rejected (no event time out of the
    // state operator -> unbounded outer state otherwise)
    val e = intercept[StreamingDql.Unstreamable] {
      StreamingDql.compile(in.toDF(),
        "SELECT sum(derivate(avg('purchase'.* BUCKET 'testdata', 1 m)), " +
          "5 m) LAST 1 h", "30 seconds")
    }
    assert(e.msg.contains("event-time"), e.msg)
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

  test("slot collapse: multi-event slots aggregate as the batch series model (append)") {
    // two events land in slot [0 s, 1 s): the batch leaf collapses them to
    // their decimal-exact mean (1+3)/2 = 2 before the window aggregation,
    // so the 1 m window avg is (2 + 6) / 2 = 4 — NOT the raw-event mean
    // (1+3+6)/3 ≈ 3.33. The chained plan emits on window close (append),
    // flushed by a sentinel past the window.
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[SeriesStream.Ev]
    val out = StreamingDql.compile(in.toDF(),
      "SELECT avg('purchase'.'1' BUCKET 'testdata', 1 m) LAST 1 h",
      "0 seconds")
    val q = out.writeStream.format("memory").queryName("sdql_slots")
      .outputMode("append").start()
    in.addData(ev(0, v = 1), ev(0, v = 3), ev(10, v = 6))
    in.addData(ev(200, v = 0)) // sentinel: closes [0, 60 s)
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT metric, ws, CAST(value AS DOUBLE) FROM sdql_slots WHERE ws < 60000")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    assert(rows.toSeq == Seq(("purchase.1", 0L, 4.0)))
  }

  test("stream resolution is configurable: the slot collapse runs at the set cadence") {
    // at a 2 s resolution, events at sec 0 and sec 1 share ONE slot
    // (davg (1+3)/2 = 2) and sec 2 its own (6) → window avg (2+6)/2 = 4;
    // the 1 s default would yield (1+3+6)/3 instead. Malformed values
    // fail with a typed error naming the conf.
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    withConf("spark.graft.streaming.resolutionMs", "2000") {
      val in = MemoryStream[SeriesStream.Ev]
      val out = StreamingDql.compile(in.toDF(),
        "SELECT avg('purchase'.'1' BUCKET 'testdata', 1 m) LAST 1 h",
        "0 seconds")
      val q = out.writeStream.format("memory").queryName("sdql_res")
        .outputMode("append").start()
      in.addData(ev(0, v = 1), ev(1, v = 3), ev(2, v = 6))
      in.addData(ev(200, v = 0)) // sentinel: closes [0, 60 s)
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT ws, CAST(value AS DOUBLE) FROM sdql_res WHERE ws < 60000")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      q.stop()
      assert(rows.toSeq == Seq((0L, 4.0)))
    }
    val e = intercept[StreamingDql.Unstreamable] {
      withConf("spark.graft.streaming.resolutionMs", "soonish") {
        val in2 = MemoryStream[SeriesStream.Ev]
        StreamingDql.compile(in2.toDF(),
          "SELECT avg('purchase'.'1' BUCKET 'testdata', 1 m) LAST 1 h",
          "0 seconds")
      }
    }
    assert(e.getMessage.contains("resolutionMs"))
  }

  test("derivate idle timeout: held-back head emits as NULL, resume restarts the chain") {
    // purchase.1 goes idle after ONE closed window (head still held back),
    // then resumes past the idle horizon; purchase.2 keeps the watermark
    // moving (glob selector: both series pass the pushed filter). Expected
    // for purchase.1: the timed-out head emits with NULL (batch's result
    // for a single-point series), and the resumed chain restarts with the
    // head-point backfill — (240 s, 20.0) and (360 s, 20.0).
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    withConf("spark.graft.streaming.derivate.idleTimeoutMs", "120000") {
      val in = MemoryStream[SeriesStream.Ev]
      val out = StreamingDql.compile(in.toDF(),
        "SELECT derivate(avg('purchase'.* BUCKET 'testdata', 1 m)) LAST 1 h",
        "0 seconds")
      val q = out.writeStream.format("memory").queryName("sdql_idle")
        .outputMode("append").start()
      def feed(evs: SeriesStream.Ev*): Unit = {
        in.addData(evs: _*); q.processAllAvailable()
      }
      feed(ev(0, v = 10), ev(0, u = 2, v = 1), ev(70, u = 2, v = 2))
      feed(ev(130, u = 2, v = 3))  // closes [0,60): p1 head held back
      feed(ev(200, u = 2, v = 4))  // watermark 200 s > head 0 s + 120 s: evict p1
      feed(ev(260, v = 50), ev(260, u = 2, v = 5)) // p1 resumes past horizon
      feed(ev(400, v = 70), ev(400, u = 2, v = 6))
      feed(ev(640, u = 2, v = 8))  // closes p1's [360,420) resume window
      val p1 = spark.sql(
        "SELECT ws, CAST(value AS DOUBLE) FROM sdql_idle " +
          "WHERE metric = 'purchase.1' ORDER BY ws").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      q.stop()
      assert(p1.toSeq == Seq(
        (0L, None),                 // timed-out head: reported, value NULL
        (240000L, Some(20.0)),      // restarted chain: backfilled head
        (360000L, Some(20.0))))     // 70 − 50
    }
  }

  test("AS naming, dvar/pvar substitution and METADATA follow the batch contract") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    withConf("spark.graft.streaming.slotExact", "false") {
      val dql = "SELECT avg('purchase'.* BUCKET 'testdata', 1 m) " +
        "AS 'rate'.$1.$'graft':'user' METADATA {'team': 'infra'} LAST 1 h"
      val in = MemoryStream[SeriesStream.Ev]
      val out = StreamingDql.compile(in.toDF(), dql, "30 seconds")
      val q = out.writeStream.format("memory").queryName("sdql_name")
        .outputMode("update").start()
      in.addData(ev(0, v = 1), ev(10, u = 2, v = 3))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT name, metric, metadata FROM sdql_name ORDER BY metric")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      q.stop()
      assert(rows.toSeq == Seq(
        ("rate.purchase.1", "purchase.1", "{\"team\": \"infra\"}"),
        ("rate.purchase.2", "purchase.2", "{\"team\": \"infra\"}")))

      // default name = unparsed selector text, exactly as batch
      val plain = "SELECT avg('purchase'.'1' BUCKET 'testdata', 1 m) LAST 1 h"
      val in2 = MemoryStream[SeriesStream.Ev]
      val out2 = StreamingDql.compile(in2.toDF(), plain, "30 seconds")
      val q2 = out2.writeStream.format("memory").queryName("sdql_name_dflt")
        .outputMode("update").start()
      in2.addData(ev(0, v = 1))
      q2.processAllAvailable()
      val names = spark.sql("SELECT DISTINCT name FROM sdql_name_dflt")
        .collect().map(_.getString(0))
      q2.stop()
      val expect = graft.dql.Unparse.expr(
        graft.dql.Parser.parse(plain).selectors.head.expr)
      assert(names.toSeq == Seq(expect))
    }
  }

  test("multi-selector funnel fuses into one stateful operator (append)") {
    // the batch dqe_funnel semantics: per-selector results merged; on the
    // stream every selector is a filtered aggregate in ONE windowed
    // groupBy (a union of streaming aggregations silently starves a
    // branch — the fused plan is also one state row per window+metric)
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dql = "SELECT avg('purchase'.'1' BUCKET 'testdata', 1 m), " +
      "max('purchase'.'1' BUCKET 'testdata', 1 m) LAST 1 h"
    val in = MemoryStream[SeriesStream.Ev]
    val out = StreamingDql.compile(in.toDF(), dql, "0 seconds")
    val q = out.writeStream.format("memory").queryName("sdql_multi")
      .outputMode("append").start()
    in.addData(ev(0, v = 1), ev(10, v = 3), ev(20, v = 8))
    in.addData(ev(200, v = 0)) // sentinel: closes [0, 60 s) on both branches
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT name, ws, CAST(value AS DOUBLE) FROM sdql_multi " +
        "WHERE ws < 60000 ORDER BY name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    val q0 = graft.dql.Parser.parse(dql)
    val Seq(nAvg, nMax) = q0.selectors.map(sel =>
      graft.dql.Unparse.expr(sel.expr))
    assert(rows.toSeq.sortBy(_._1) == Seq(
      (nAvg, 0L, 4.0), (nMax, 0L, 8.0)).sortBy(_._1))
  }

  test("multi-selector funnel applies per-selector transforms above the fused agg") {
    // transforms above each aggregation are peeled and re-applied to the
    // selector's OWN unpivoted column: add(+100) must touch only the sum
    // selector, min(5) (clamp) only the max selector
    val rows = run(
      "SELECT add(sum('purchase'.'1' BUCKET 'testdata', 1 m), 100), " +
        "min(max('purchase'.'1' BUCKET 'testdata', 1 m), 5) LAST 1 h",
      Seq(ev(0, v = 1), ev(10, v = 3), ev(20, v = 8)), "sdql_multi_trans")
    assert(rows.toSeq.map(_._3).sorted == Seq(5.0, 112.0))
  }

  test("multi-selector funnel: update-capable single-stage, mixed types, per-selector rows") {
    // without the slot collapse the fused funnel is ONE stateful operator,
    // so unlike a union of aggregations it still runs update mode. The two
    // selectors match DISJOINT series (each metric only gets its own
    // selector's rows) and mix a DOUBLE avg with a BIGINT count — the
    // stack coerces to the union's common type like the batch merge.
    val rows = run(
      "SELECT avg('purchase'.'1' BUCKET 'testdata', 1 m), " +
        "count_above('purchase'.'2' BUCKET 'testdata', 5, 1 m) LAST 1 h",
      Seq(ev(0, v = 2), ev(10, v = 4),
        ev(5, u = 2, v = 7), ev(20, u = 2, v = 3)), "sdql_multi_upd")
    assert(rows.toSeq == Seq(
      ("purchase.1", 0L, 3.0), ("purchase.2", 0L, 1.0)))
  }

  test("malformed streaming confs fail with typed errors naming the conf") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[SeriesStream.Ev]
    val avg = "SELECT avg('purchase'.'1' BUCKET 'testdata', 1 m) LAST 1 h"
    withConf("spark.graft.streaming.slotExact", " False ") {
      // trimmed + case-insensitive parse still accepts it
      StreamingDql.compile(in.toDF(), avg, "30 seconds")
    }
    val e1 = intercept[StreamingDql.Unstreamable] {
      withConf("spark.graft.streaming.slotExact", "bogus") {
        StreamingDql.compile(in.toDF(), avg, "30 seconds")
      }
    }
    assert(e1.getMessage.contains("spark.graft.streaming.slotExact"))
    val e2 = intercept[StreamingDql.Unstreamable] {
      withConf("spark.graft.streaming.derivate.idleTimeoutMs", "soon") {
        StreamingDql.compile(in.toDF(),
          "SELECT derivate(avg('purchase'.'1' BUCKET 'testdata', 1 m)) LAST 1 h",
          "30 seconds")
      }
    }
    assert(e2.getMessage.contains("idleTimeoutMs"))
  }

  test("confidence slot-set state is bounded: oversized window/res ratio refused") {
    // 14 d window at the 1 s stream resolution = 1 209 600 slots in ONE
    // state row — past the documented cap, refused at compile time
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[SeriesStream.Ev]
    val e = intercept[StreamingDql.Unstreamable] {
      StreamingDql.compile(in.toDF(),
        "SELECT count_above_conf('purchase'.'1' BUCKET 'testdata', 0.5, 14 d) LAST 30 d",
        "30 seconds")
    }
    assert(e.getMessage.contains("maxSlots"))
    // and a raised cap admits the same shape
    withConf("spark.graft.streaming.conf.maxSlots", "2000000") {
      StreamingDql.compile(in.toDF(),
        "SELECT count_above_conf('purchase'.'1' BUCKET 'testdata', 0.5, 14 d) LAST 30 d",
        "30 seconds")
    }
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
    intercept[StreamingDql.Unstreamable] {
      // multi-selector funnels fuse same-window aggregations; a keyed-state
      // selector (derivate) cannot join the fused operator
      StreamingDql.compile(in.toDF(),
        "SELECT derivate(avg('purchase'.'1' BUCKET 'testdata', 1 m)), " +
          "avg('purchase'.'2' BUCKET 'testdata', 1 m) LAST 1 h",
        "30 seconds")
    }
    intercept[StreamingDql.Unstreamable] {
      // and the fused window must be shared (the batch funnel's own
      // resolution_conflict)
      StreamingDql.compile(in.toDF(),
        "SELECT avg('purchase'.'1' BUCKET 'testdata', 1 m), " +
          "avg('purchase'.'2' BUCKET 'testdata', 2 m) LAST 1 h",
        "30 seconds")
    }
  }
}
