package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{AsofJoin, RangeJoin}

/** Property tests: the distributed join formulations agree with
  * brute-force reference computations on generated inputs.
  * (scalatestplus isn't on the classpath — generators driven directly
  * with fixed seeds, as in dql/ParseUnparseSpec.)
  */
class JoinOpsPropertySpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private val rowGen = for {
    k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 40L)
    v <- Gen.choose(-100, 100)
  } yield (k, t, v.toDouble)

  test("asof agrees with the brute-force greatest-ts<=t lookup") {
    val s = spark
    import s.implicits._
    val casesGen = for {
      l <- Gen.nonEmptyListOf(rowGen); r <- Gen.listOf(rowGen)
    } yield (l, r)
    samples(casesGen, 12) { case (lRows, rRows0) =>
      // right side must be unique per (key, ts) — the operator's contract
      val rRows = rRows0.groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val l = lRows.toDF("k", "ts_ms", "value")
      val r = rRows.toDF("k", "ts_ms", "value")
      val ord = Ordering.by((t: (Long, Long, Double, Option[Double])) =>
        (t._1, t._2, t._3))
      val got = AsofJoin.asof(l, r, Seq("k"), "ts_ms", "value", "rv")
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
          if (x.isNullAt(3)) None else Some(x.getDouble(3))))
        .toSeq.sorted(ord)
      val want = lRows.map { case (k, t, v) =>
        val best = rRows.filter(rr => rr._1 == k && rr._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        (k, t, v, best)
      }.sorted(ord)
      assert(got == want)
    }
  }

  test("range join agrees with the brute-force containment scan") {
    val s = spark
    import s.implicits._
    val ivalGen = for {
      k <- Gen.choose(1L, 3L); lo <- Gen.choose(0L, 40L)
      len <- Gen.choose(0L, 15L)
    } yield (k, lo, lo + len)
    val casesGen = for {
      p <- Gen.nonEmptyListOf(rowGen); i <- Gen.nonEmptyListOf(ivalGen)
    } yield (p, i)
    samples(casesGen, 12) { case (pts, ivals) =>
      val p = pts.toDF("k", "ts_ms", "v")
      val i = ivals.toDF("k", "lo", "hi")
      val got = RangeJoin.join(p, i, Seq("k"), "ts_ms", "lo", "hi",
        chunkMs = 7L)
        .select("k", "ts_ms", "v", "lo", "hi").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
          x.getLong(3), x.getLong(4))).toSeq.sorted
      val want = (for {
        (k, t, v) <- pts
        (ik, lo, hi) <- ivals
        if ik == k && t >= lo && t <= hi
      } yield (k, t, v, lo, hi)).sorted
      assert(got == want)
    }
  }
}
