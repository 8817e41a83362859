package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the Rolling monitoring family against brute-force
  * reference computations on generated series: EWMA stays inside its
  * window's hull and agrees with the direct weighted sum; the z-score is
  * NULL exactly on zero-variance windows; rate agrees with the
  * reset-aware reference; MAD scores are non-negative and NULL exactly
  * on zero-MAD windows. (Generators driven directly with fixed seeds —
  * JoinOpsPropertySpec's pattern.)
  */
class RollingPropertySpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def samples[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var checked = 0
    var i = 0
    while (checked < n && i < n * 3) {
      val params = Gen.Parameters.default.withSize(6 + i * 3)
      gen(params, Seed(i.toLong)).foreach { a => f(a); checked += 1 }
      i += 1
    }
    assert(checked >= n / 2, s"generator exhausted: only $checked samples")
  }

  /** one series: strictly increasing ts with generated values */
  private val seriesGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.choose(-1000, 1000).map(_ / 7.0))

  private def df(vs: List[Double]) = {
    val s = spark
    import s.implicits._
    vs.zipWithIndex.map { case (v, i) => ("m", i.toLong, v) }
      .toDF("metric", "ts_ms", "value")
  }

  test("ewma: inside the window hull; equals the direct weighted sum") {
    val n = 4
    samples(seriesGen, 20) { vs =>
      val out = Rolling.ewma(df(vs), n).orderBy("ts_ms").collect()
        .map(_.getDouble(3))
      vs.indices.foreach { i =>
        val win = vs.slice(math.max(0, i - n + 1), i + 1)
        assert(out(i) >= win.min - 1e-7 && out(i) <= win.max + 1e-7,
          s"ewma ${out(i)} outside hull of $win")
        // direct reference: weight 2^j for the j-th newest... oldest
        // carries 2^0? No — newest carries the largest weight
        val ref = {
          val w = win.indices.map(j => (1L << j).toDouble) // oldest→newest
          win.zip(w).map { case (v, wt) => v * wt }.sum / w.sum
        }
        assert(math.abs(out(i) - ref) < 1e-6,
          s"ewma ${out(i)} != reference $ref for $win")
      }
    }
  }

  test("zscore: NULL exactly on zero-variance windows; |z| finite") {
    val n = 3
    samples(seriesGen, 20) { vs =>
      val out = Rolling.zscore(df(vs), n, 2.0).orderBy("ts_ms").collect()
      vs.indices.foreach { i =>
        val win = vs.slice(math.max(0, i - n + 1), i + 1)
        val flat = win.forall(_ == win.head)
        // a flat window scores NULL when its values carry ≤ 10 decimal
        // places (the decimal-exact moments agree exactly); values
        // needing more precision can leave an epsilon variance after
        // rounding — the z then lands near zero, never a spurious flag
        if (flat && !out(i).isNullAt(3))
          assert(math.abs(out(i).getDouble(3)) < 1e-3,
            s"flat window scored |z|=${out(i).getDouble(3)}")
        if (!flat)
          assert(!out(i).isNullAt(3) || win.distinct.size == 1)
        if (!out(i).isNullAt(3))
          assert(!out(i).getDouble(3).isNaN && !out(i).getDouble(3).isInfinite)
      }
    }
  }

  test("rate: agrees with the reset-aware reference") {
    samples(seriesGen, 20) { vs =>
      val out = Rolling.rate(df(vs)).orderBy("ts_ms").collect()
      vs.indices.foreach { i =>
        if (i == 0) assert(out(i).isNullAt(3))
        else {
          val d = if (vs(i) - vs(i - 1) < 0) vs(i) else vs(i) - vs(i - 1)
          val ref = d / 0.001 // ts step is 1 ms
          assert(math.abs(out(i).getDouble(3) - ref) < 1e-6)
        }
      }
    }
  }

  test("rate: duplicate timestamps yield NULL, not Infinity") {
    val s = spark
    import s.implicits._
    // two points share ts 10: non-advancing time must not produce a
    // zero-divisor Infinity (DuckDB) or engine-dependent NULL — the
    // guard pins NULL on the tied point in both engines
    val rows = Seq(("m", 0L, 1.0), ("m", 10L, 2.0), ("m", 10L, 3.0),
      ("m", 20L, 4.0))
    val out = Rolling.rate(rows.toDF("metric", "ts_ms", "value"))
      .orderBy("ts_ms", "value").collect()
    assert(out(0).isNullAt(3)) // first point: no predecessor
    // whichever dup sorts second sees ts_ms == lag(ts_ms) → NULL
    assert(out.count(r => !r.isNullAt(3) && (r.getDouble(3).isInfinite ||
      r.getDouble(3).isNaN)) == 0)
    assert(out.exists(r => r.getLong(1) == 10L && r.isNullAt(3)))
    val last = out.find(_.getLong(1) == 20L).get
    assert(!last.isNullAt(3)) // time advanced again → defined rate
  }

  test("mad: non-negative scores; NULL exactly on zero-MAD windows") {
    val n = 5
    samples(seriesGen, 20) { vs =>
      val out = Rolling.mad(df(vs), n, 3.0).orderBy("ts_ms").collect()
      vs.indices.foreach { i =>
        val win = vs.slice(math.max(0, i - n + 1), i + 1).sorted
        val med =
          if (win.size % 2 == 1) win(win.size / 2)
          else (win(win.size / 2 - 1) + win(win.size / 2)) / 2.0
        val devs = win.map(x => math.abs(x - med)).sorted
        val mad =
          if (devs.size % 2 == 1) devs(devs.size / 2)
          else (devs(devs.size / 2 - 1) + devs(devs.size / 2)) / 2.0
        assert(out(i).isNullAt(3) == (mad == 0.0),
          s"mad null=${out(i).isNullAt(3)} but MAD=$mad for $win")
        if (!out(i).isNullAt(3)) assert(out(i).getDouble(3) >= 0.0)
      }
    }
  }

  test("holt: exact-decimal fold tracks the double recursion; seed row" +
    " is (x1, 0)") {
    samples(seriesGen, 20) { vs =>
      val out = Rolling.holt(df(vs)).orderBy("ts_ms").collect()
      assert(out.length == vs.length)
      // the fold seeds from the 9dp-rounded first value (decimal state)
      assert(math.abs(out.head.getDouble(3) - vs.head) < 1e-9 &&
        out.head.getDouble(4) == 0.0)
      var s = vs.head; var b = 0.0
      vs.indices.drop(1).foreach { i =>
        val nl = 0.5 * vs(i) + 0.5 * (s + b)
        b = 0.5 * (nl - s) + 0.5 * b
        s = nl
        assert(math.abs(out(i).getDouble(3) - s) < 1e-6,
          s"level ${out(i).getDouble(3)} != brute $s at $i")
        assert(math.abs(out(i).getDouble(4) - b) < 1e-6)
      }
    }
  }

  test("cusum: prefix-sum closed form equals the brute-force recursion") {
    val ref = 3.0
    samples(seriesGen, 20) { vs =>
      val out = Rolling.cusum(df(vs), ref, threshold = 5.0)
        .orderBy("ts_ms").collect()
      var s = 0.0
      vs.indices.foreach { i =>
        s = math.max(0.0, s + (vs(i) - ref))
        assert(math.abs(out(i).getDouble(3) - s) < 1e-6,
          s"cusum ${out(i).getDouble(3)} != brute $s at $i for $vs")
        assert(out(i).getBoolean(4) == (out(i).getDouble(3) > 5.0))
      }
    }
  }

  test("snaive: exact season-back lookup only; MAE/ME match brute force") {
    val s = spark
    import s.implicits._
    // season 10: ts 0..4 have no predecessor; 10,12,14 do; 13 does NOT
    // (no slot at 3) — the RANGE frame must not fall back to a near miss
    val rows = Seq(
      ("m", 0L, 1.0), ("m", 2L, 2.0), ("m", 4L, 7.0),
      ("m", 10L, 4.0), ("m", 12L, 1.0), ("m", 13L, 9.0), ("m", 14L, 3.0),
      ("k", 0L, 5.0), ("k", 10L, 5.0))
    val out = Rolling.snaive(rows.toDF("metric", "ts_ms", "value"), 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // m evaluable: (10,4 vs 1), (12,1 vs 2), (14,3 vs 7) -> |e| 3,1,4; e 3,-1,-4
    assert(out("m") == ((3L, 8.0 / 3, -2.0 / 3)))
    assert(out("k") == ((1L, 0.0, 0.0)))
  }
}
