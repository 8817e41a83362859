package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Power-iteration PCA: the recovered direction must align with a
  * planted dominant axis, be unit-length, improve with iterations, and
  * be sign-deterministic from the fixed seed.
  */
class PcaSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val D = 8

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // planted axis u (unit): dominant variance along it, deterministic
  // small off-axis jitter from the index
  private val u: Array[Double] = {
    val raw = Array.tabulate(D)(j => 1.0 + 0.3 * j)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }

  private def corpus = {
    val s = spark
    import s.implicits._
    (0 until 200).map { i =>
      val a = (i % 21) - 10.0          // spread along u: [-10, 10]
      val emb = Array.tabulate(D) { j =>
        (a * u(j) + 0.05 * math.sin(i * (j + 1))).toFloat
      }
      (i.toLong, emb.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def loadingsOf(iters: Int): Array[Double] =
    Pca.topComponent(corpus, D, iters).collect()
      .sortBy(_.getInt(0)).map(_.getDouble(1))

  private def align(v: Array[Double]): Double =
    math.abs(v.zip(u).map { case (a, b) => a * b }.sum)

  test("recovers the planted dominant direction (|cos| > 0.999)") {
    val v = loadingsOf(5)
    assert(align(v) > 0.999, s"alignment ${align(v)} for ${v.toSeq}")
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"loading norm $norm")
  }

  test("alignment does not degrade with more iterations; eigval positive" +
    " and stable") {
    val a1 = align(loadingsOf(1))
    val a3 = align(loadingsOf(3))
    assert(a3 >= a1 - 1e-9, s"iter3 $a3 < iter1 $a1")
    val rows = Pca.topComponent(corpus, D, 3).collect()
    val eig = rows.map(_.getDouble(2)).distinct
    assert(eig.length == 1 && eig.head > 0.0)
  }

  test("deterministic across reruns, including the sign") {
    val a = loadingsOf(3)
    val b = loadingsOf(3)
    assert(a.toSeq == b.toSeq)
  }

  test("exact-fixpoint early exit is a no-op: iters=3 result == iters=9" +
    " once the direction stops moving") {
    // a rank-1 corpus (zero jitter) converges in one step: the 9dp
    // loadings reach their fixpoint immediately, so huge iter counts
    // must return the identical (loading, eigval) rows without paying
    // for the extra steps
    val s = spark
    import s.implicits._
    val rank1 = (0 until 100).map { i =>
      val a = (i % 11) - 5.0
      (i.toLong, Array.tabulate(D)(j => (a * u(j)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val r3 = Pca.topComponent(rank1, D, 3).collect().map(_.toSeq)
    val r9 = Pca.topComponent(rank1, D, 9).collect().map(_.toSeq)
    assert(r3.toSeq == r9.toSeq)
  }

  test("deflation: components are orthonormal, eigenvalues non-increasing," +
    " rank-k residual below rank-1") {
    val comps = Pca.topComponents(corpus, D, iters = 5, k = 4).collect()
    val byC = comps.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
      case (c, rows) =>
        (c, rows.sortBy(_.getInt(1)).map(_.getDouble(2)),
          rows.head.getDouble(3))
    }
    assert(byC.map(_._1) == Seq(1, 2, 3, 4))
    // unit length + pairwise orthogonality (9dp ladder → loose tolerance)
    for ((_, v, _) <- byC)
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-6)
    for (Seq((_, a, _), (_, b, _)) <- byC.combinations(2))
      assert(math.abs(a.zip(b).map { case (x, y) => x * y }.sum) < 1e-4)
    // eigenvalue order
    val eigs = byC.map(_._3)
    assert(eigs.zip(eigs.tail).forall { case (a, b) => a >= b - 1e-9 })
    // component 1 of the deflation ladder == the plain top component
    val top = Pca.topComponent(corpus, D, 5).collect()
      .sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(byC.head._2.toSeq == top.toSeq)
    // rank-2 explains at least as much as rank-1: resid_k <= resid_1
    val r1 = Pca.projectK(corpus, D, 5, 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val r2 = Pca.projectK(corpus, D, 5, 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(r1.keySet == r2.keySet)
    assert(r1.forall { case (k, v) => r2(k) <= v + 1e-9 })
  }

  test("frozen-ladder scoring is bit-identical to inline training " +
    "(the r20 memoized-projection contract)") {
    val inline = Pca.projectK(corpus, D, iters = 3, k = 2)
      .orderBy("vec_id").collect()
    val (mean, ladder) = Pca.trainLadder(corpus, D, iters = 3, k = 2)
    val frozen = Pca.projectKFrom(corpus, mean, ladder.map(_._1))
      .orderBy("vec_id").collect()
    assert(inline.length == frozen.length && inline.nonEmpty)
    inline.zip(frozen).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      (1 to 3).foreach { c =>
        assert(java.lang.Double.doubleToRawLongBits(a.getDouble(c)) ==
          java.lang.Double.doubleToRawLongBits(b.getDouble(c)),
          s"vec ${a.getLong(0)} col $c: ${a.getDouble(c)} vs ${b.getDouble(c)}")
      }
    }
  }

  test("projection: resid ≈ 0 on-axis, proj ≈ 0 orthogonal; streaming" +
    " form is stateless and bit-equal to batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val m = Pca.meanRow(corpus)
    val v = Pca.topComponentRow(corpus, D, 5)
    val batch = Pca.project(corpus, m, v).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // corpus points sit near the planted axis: residuals stay at the
    // jitter scale while |proj| spans the spread
    assert(batch.values.forall(_._2 < 0.3))
    assert(batch.values.map(p => math.abs(p._1)).max > 5.0)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val out = Pca.project(in.toDF().toDF("vec_id", "embedding"), m, v)
    val q = out.writeStream.format("memory").queryName("sproj")
      .outputMode("append").start()
    in.addData(corpus.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1))).toSeq: _*)
    q.processAllAvailable()
    val st = spark.table("sproj").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(q.lastProgress.stateOperators.isEmpty)
    q.stop()
    assert(st.size == batch.size)
    assert(st.forall { case (k, (p, r)) =>
      java.lang.Double.doubleToRawLongBits(p) ==
        java.lang.Double.doubleToRawLongBits(batch(k)._1) &&
      java.lang.Double.doubleToRawLongBits(r) ==
        java.lang.Double.doubleToRawLongBits(batch(k)._2) })
  }
}
