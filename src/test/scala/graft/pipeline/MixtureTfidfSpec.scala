package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Edge semantics of mixture sampling and TF-IDF the corpus gates don't
  * pin: the rate clamp at 1.0, the inverse-sqrt acceptance ratio, IDF of
  * a corpus-wide term, and the per-doc tie-break.
  */
class MixtureTfidfSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs(rows: (Long, String, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text", "lang", "source")
  }

  test("strata at or below nRef are kept whole; larger strata downsample") {
    val small = (0L until 10L).map(i => (i, s"t$i", "small", "s"))
    val big = (100L until 500L).map(i => (i, s"t$i", "big", "s"))
    val out = Curation.sampleMixture(docs((small ++ big): _*), "lang", 10L)
      .collect()
    val bySt = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySt("small") == 10) // rate clamps at 1.0
    // big stratum: rate = sqrt(10/400) ≈ 0.158 → md5-uniform keeps ~63
    val kept = bySt("big")
    assert(kept > 30 && kept < 100, s"kept $kept of 400")
    // threshold column is the same for every kept row of a stratum
    assert(out.filter(_.getString(1) == "big")
      .map(_.getLong(4)).distinct.length == 1)
  }

  test("tfidf: corpus-wide terms score zero, rare terms rank first") {
    val out = TextOps.tfidfTopK(docs(
      (1L, "common alpha common", "en", "s"),
      (2L, "common beta", "en", "s"),
      (3L, "common beta gamma", "en", "s"),
      (4L, "common delta", "en", "s")), 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(4)))
    // 'common' is in all 4 docs → idf = log10(1) = 0 everywhere
    assert(out.filter(_._3 == "common").forall(_._4 == 0.0))
    // doc 1: alpha (df=1, idf=log10 4) beats common (0) despite tf 2
    assert(out.filter(_._1 == 1L).head._3 == "alpha")
    // doc 3: beta (df=2) and gamma (df=1) — gamma's higher idf wins rank 1
    val d3 = out.filter(_._1 == 3L).map(t => (t._2, t._3)).toSeq
    assert(d3 == Seq((1L, "gamma"), (2L, "beta")))
  }

  test("unigram logprob: unseen words score the add-one floor log10(1/N)") {
    // model trained on a 4-token corpus: aa aa bb cc
    val model = TextOps.unigramModel(docs((1L, "aa aa bb cc", "en", "s")))
    val out = TextOps.unigramLogProb(
      docs((9L, "aa zz", "en", "s")), model).collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L)
    // aa: log10(2/4); zz unseen: log10(1/4); mean of the two 9-rounded
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = (r9(math.log10(2.0 / 4)) + r9(math.log10(1.0 / 4))) / 2
    assert(math.abs(out.head.getDouble(2) - exp) < 1e-12)
  }

  test("tfidf ties on score break on the term, ascending") {
    val out = TextOps.tfidfTopK(docs(
      (1L, "zz aa", "en", "s"),
      (2L, "filler", "en", "s")), 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // both aa and zz have tf=1, df=1 → identical score; aa ranks first
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._3)).toSeq ==
      Seq((1L, "aa"), (2L, "zz")))
  }
}
