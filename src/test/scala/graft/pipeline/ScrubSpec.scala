package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Edge semantics of the corpus-scrub operators (PII redaction, URL
  * dedup, segment-level dedup, vocabulary stats) that the corpus-backed
  * gates cannot exercise: replacement ordering, word boundaries, ties,
  * all-duplicate documents, and deterministic top-k cutoffs.
  */
class ScrubSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ------------------------------------------------------------- redact

  private def redact(texts: (Long, String)*): Map[Long, (Int, Int, Int, String)] = {
    val s = spark
    import s.implicits._
    TextOps.redactPii(texts.toSeq.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
  }

  test("redact replaces every category, emails before their dotted hosts") {
    val out = redact(
      1L -> "mail a.b-c_d@sub.host.org now, server 192.168.0.1 up, call +1-555-0100",
      2L -> "clean text with no personal data at all")
    assert(out(1L) == ((1, 1, 1,
      "mail <EMAIL> now, server <IP> up, call <PHONE>")))
    assert(out(2L) == ((0, 0, 0, "clean text with no personal data at all")))
  }

  test("ip needs exactly four 1-3 digit octets on word boundaries") {
    val out = redact(
      1L -> "version 1.2.3.4000 stays, 10.0.0.7 goes, 1.2.3 stays",
      2L -> "two ips 8.8.8.8 9.9.9.9 and two mails a@b.io c@d.co")
    assert(out(1L)._3 == 1)
    assert(out(1L)._4 == "version 1.2.3.4000 stays, <IP> goes, 1.2.3 stays")
    assert(out(2L) == ((2, 0, 2, "two ips <IP> <IP> and two mails <EMAIL> <EMAIL>")))
  }

  test("counts are measured on the raw text, not post-replacement") {
    // the email's host is NOT counted as an IP even though the email is
    // replaced first: n_ip comes from the raw string where the email
    // pattern's host is alphabetic
    val out = redact(1L -> "x@y.com at 1.2.3.4")
    assert(out(1L) == ((1, 0, 1, "<EMAIL> at <IP>")))
  }

  // ------------------------------------------------------------ urlKeepBest

  test("urlKeepBest keeps the longest capture, ties to smallest doc_id") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "u1", 100L), (2L, "u1", 300L), (3L, "u1", 300L),
      (4L, "u2", 50L)).toDF("doc_id", "source", "n_chars")
    val kept = Dedup.urlKeepBest(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("u1" -> 2L, "u2" -> 4L))
  }

  // ----------------------------------------------------------- segments

  private def segs(texts: (Long, String)*): Map[Long, (Long, Long, String)] = {
    val s = spark
    import s.implicits._
    Dedup.segmentDedup(texts.toSeq.toDF("doc_id", "text"), 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
  }

  test("shared segments drop from every holder, order preserved") {
    // "a b" is segment 0 of both docs -> boilerplate; the tails differ
    val out = segs(1L -> "a b c d e", 2L -> "a b x y")
    assert(out(1L) == ((3L, 1L, "c d e")))
    assert(out(2L) == ((2L, 1L, "x y")))
  }

  test("within-doc repeats are NOT boilerplate; all-dup doc empties") {
    // "p q p q": segments "p q","p q" repeat within ONE doc -> nd=1, kept
    val out = segs(1L -> "p q p q", 2L -> "z z", 3L -> "z z")
    assert(out(1L) == ((2L, 0L, "p q p q")))
    assert(out(2L) == ((1L, 1L, "")))
    assert(out(3L) == ((1L, 1L, "")))
  }

  test("partial tail segment joins the remaining words") {
    val out = segs(1L -> "a b c")
    assert(out(1L) == ((2L, 0L, "a b c")))
  }

  // -------------------------------------------------------------- vocab

  test("vocab/bigram top-k cutoff is deterministic on count then term") {
    val s = spark
    import s.implicits._
    // counts: b=3, a=2, c=2, d=1 -> k=2 keeps b then a (tie a<c on term)
    val docs = Seq((1L, "b a c b"), (2L, "b a c d")).toDF("doc_id", "text")
    val v = TextOps.vocabTopK(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v.toSeq == Seq(("b", 3L, 2L), ("a", 2L, 2L)))
    val bg = TextOps.bigramTopK(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // bigrams: "b a"=2(docs 1,2), "a c"=2(docs 1,2), "c b"=1, "c d"=1
    assert(bg.toSeq == Seq(("a c", 2L, 2L), ("b a", 2L, 2L)))
  }
}
