package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.pipeline.Dedup

/** The iterative min-label + pointer-jumping connected components must
  * equal a driver-side union-find on random pair graphs (chains, stars,
  * cycles, forests — whatever the generator produces).
  */
class CanonicalizePropertySpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("canonicalize equals union-find on random graphs (incl. long chains)") {
    val s = spark
    import s.implicits._
    val pairGen = for {
      a <- Gen.choose(1L, 24L); b <- Gen.choose(1L, 24L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    // deliberate worst case for label propagation: a 16-node path
    val chain = (1L until 16L).map(i => (i, i + 1))
    var i = 0
    var checked = 0
    while (checked < 6 && i < 20) {
      val params = Gen.Parameters.default.withSize(10 + i * 4)
      Gen.nonEmptyListOf(pairGen)(params, Seed(i.toLong)).foreach { ps =>
        val pairs = (if (i == 0) chain else ps.distinct).toList
        val got = Dedup.canonicalize(
          pairs.toDF("doc_a", "doc_b")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == unionFind(pairs), s"graph: $pairs")
        checked += 1
      }
      i += 1
    }
    assert(checked >= 4)
  }
}
