package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Band-index append maintenance: an index maintained by
  * [[Dedup.bandIndexAppend]] must answer near-dup queries exactly like
  * an index rebuilt from the concatenated corpus — including pairs whose
  * two ends sit on OPPOSITE sides of the base/delta boundary (the case a
  * stale index misses entirely).
  */
class BandIndexSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  test("appended index pairs equal the full rebuild on fuzzed " +
    "base/delta splits, boundary pairs included") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val vocab = ('a' to 'h').map(_.toString)
      // template-mutation corpus: clusters of near-identical documents so
      // the >= 0.5 Jaccard band actually fires, ids interleaved so every
      // cluster straddles the % 3 boundary
      val templates = (0 until 6).map(_ =>
        (0 until (8 + rnd.nextInt(8)))
          .map(_ => vocab(rnd.nextInt(vocab.length))).toVector)
      val texts = (0L until 36L).map { id =>
        val t = templates(rnd.nextInt(templates.length))
        val mutated =
          if (rnd.nextBoolean()) t.updated(rnd.nextInt(t.length),
            vocab(rnd.nextInt(vocab.length)))
          else t
        id -> mutated.mkString(" ")
      }
      val all = texts.toDF("doc_id", "text")
      val base = all.where(col("doc_id") % 3 =!= 0)
      val delta = all.where(col("doc_id") % 3 === 0)
      val appended = Dedup.bandIndexAppend(Dedup.bandIndex(base), delta)
      val got = pairsOf(Dedup.minhashPairsFromIndex(appended, 0.5))
      val rebuilt = pairsOf(
        Dedup.minhashPairsFromIndex(Dedup.bandIndex(all), 0.5))
      assert(got == rebuilt, s"seed=$seed")
      // and the index probe itself agrees with the candidate-generation
      // dedup operator over the same corpus (same bands, same verify)
      val direct = pairsOf(Dedup.minhashPairs(all, 0.5))
      assert(got == direct, s"seed=$seed (index vs direct)")
      // the boundary actually exercised: at least one pair crosses it
      assert(got.exists { case (a, b, _) =>
        (a % 3 == 0) != (b % 3 == 0) }, s"seed=$seed produced no boundary pair")
    }
  }
}
