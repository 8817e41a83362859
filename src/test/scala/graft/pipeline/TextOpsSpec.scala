package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Edge semantics of the Gopher-style repetition signals that the
  * corpus-backed `text_repetition` gate cannot exercise: empty and
  * single-token docs (no n-grams → 0.0 fractions, unflagged), maximal
  * repetition (all-equal tokens), whitespace-run tokenization, and the
  * exact integer/integer division values.
  */
class TextOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(texts: (Long, String)*): Map[Long, (Double, Double, Double, Boolean)] = {
    val s = spark
    import s.implicits._
    TextOps.repetition(texts.toSeq.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
  }

  test("no n-grams -> 0.0 fractions and no flag (empty / 1-token docs)") {
    val out = run(1L -> "", 2L -> "x", 3L -> "   ")
    assert(out(1L) == ((0.0, 0.0, 0.0, false)))
    assert(out(2L) == ((0.0, 0.0, 0.0, false)))
    assert(out(3L) == ((0.0, 0.0, 0.0, false)))
  }

  test("all-equal tokens give maximal fractions and the flag") {
    // 6×"a": g2 = 5×"a a" (top 5/5), g3 = 4 (top 4/4), g5 = 2, 1 dup
    val out = run(1L -> "a a a a a a")
    assert(out(1L) == ((1.0, 1.0, 0.5, true)))
  }

  test("distinct tokens stay under the thresholds") {
    val text = (0 until 30).map(i => s"w$i").mkString(" ")
    val out = run(1L -> text)
    assert(out(1L) == ((1.0 / 29, 1.0 / 28, 0.0, false)))
  }

  test("runs of spaces never become tokens or grams") {
    // after filtering empties: w = [a, b] -> one bigram, top 1/1 = 1.0
    val out = run(1L -> "  a  b ")
    assert(out(1L) == ((1.0, 0.0, 0.0, true)))
  }

  test("entropy: single-word doc is 0, uniform doc is log2(n)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      1L -> "a a a a",               // one distinct word -> H = 0
      2L -> "a b c d",               // uniform over 4 -> H = 2.0
      3L -> "a a b b c c d d",       // still uniform over 4 -> H = 2.0
      4L -> "a a a b"                // skewed: 0.75/0.25 split
    ).toDF("doc_id", "text")
    val out = TextOps.entropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((1L, 0.0)))
    assert(out(2L) == ((4L, 2.0)))
    assert(out(3L) == ((4L, 2.0)))
    // -(0.75*log2(0.75) + 0.25*log2(0.25)), each term rounded to 9dp
    val expected = -(math.rint(0.75 * (math.log(0.75) / math.log(2.0)) * 1e9) / 1e9 +
      math.rint(0.25 * (math.log(0.25) / math.log(2.0)) * 1e9) / 1e9)
    assert(out(4L)._1 == 2L)
    assert(math.abs(out(4L)._2 - expected) < 1e-12)
  }

  test("entropy: space runs never count as words; wordless docs drop") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      1L -> "  a  b ",    // empty split tokens filtered -> uniform over 2
      2L -> "",           // no words -> no output row
      3L -> "   "         // only spaces -> no output row
    ).toDF("doc_id", "text")
    val out = TextOps.entropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L))
    assert(out(1L) == ((2L, 1.0)))
  }

  test("chunks: stride windows, short tail, sub-window doc, wordless drop") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      1L -> (1 to 7).map(i => s"w$i").mkString(" "), // n=3,stride=2: 4 chunks
      2L -> "a b",                                   // shorter than n: 1 chunk
      3L -> ""                                       // wordless: no chunks
    ).toDF("doc_id", "text")
    val out = TextOps.chunks(docs, n = 3, stride = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set((1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L), (2L, 0L)))
    assert(out((1L, 0L)) == (("w1 w2 w3", 3L)))
    assert(out((1L, 1L)) == (("w3 w4 w5", 3L)))
    assert(out((1L, 2L)) == (("w5 w6 w7", 3L)))
    assert(out((1L, 3L)) == (("w7", 1L)))            // tail chunk is short
    assert(out((2L, 0L)) == (("a b", 2L)))
  }

  test("hash features: counts partition the words; buckets stay in domain") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      1L -> "a b a c a b",   // counts must sum to 6
      2L -> "",              // wordless: no rows
      3L -> "x"              // one word, one bucket, n=1
    ).toDF("doc_id", "text")
    val out = TextOps.hashFeatures(docs, dim = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall { case (_, b, n) => b >= 0 && b < 8 && n > 0 })
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byDoc == Map(1L -> 6L, 3L -> 1L))
    // same word -> same bucket: doc 1 has at most 3 distinct buckets
    assert(out.count(_._1 == 1L) <= 3)
  }

  test("gopher rules: each rule can fail a doc on its own") {
    val s = spark
    import s.implicits._
    val good = ("the cat and dog " * 10).trim              // passes all
    val docs = Seq(
      1L -> good,
      2L -> "the and of",                                  // too few words
      3L -> ("a b c d " * 10 + "the and").trim,            // mean len < 3
      4L -> (good + " ### ## # # # #"),                    // symbols
      5L -> (("1 2 3 4 5 6 7 8 9 0 " * 4) + good),         // alpha < 0.8
      6L -> ("cat dog bird fish " * 10).trim               // no stop words
    ).toDF("doc_id", "text")
    val out = TextOps.gopherRules(docs, minWords = 10, maxWords = 1000)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(out(1L), "the clean doc must keep")
    (2L to 6L).foreach(i => assert(!out(i), s"doc $i must fail"))
  }
}
