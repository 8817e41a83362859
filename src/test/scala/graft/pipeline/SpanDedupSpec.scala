package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Exact substring-span dedup: duplicated n-gram windows must merge into
  * MAXIMAL spans (overlap-or-touch rule), self-repeats count, and spans
  * separated by more than n tokens stay separate.
  */
class SpanDedupSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def spans(texts: (Long, String)*): Map[Long, (Long, Long)] = {
    val s = spark
    import s.implicits._
    Dedup.substringSpans(texts.toDF("doc_id", "text"), 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("cross-document repeats merge overlapping windows into one span") {
    val out = spans(
      (0L, "a b c d e f"),      // abc + bcd duplicated -> one span [0,3]
      (1L, "x a b c y z"),      // abc at pos 1 -> span [1,3]
      (2L, "a b c d q1 q2"),    // abc + bcd -> one span [0,3]
      (3L, "b c d w1 w2 w3"))   // bcd at pos 0 -> span [0,2]
    assert(out == Map(
      0L -> ((1L, 4L)), 1L -> ((1L, 3L)),
      2L -> ((1L, 4L)), 3L -> ((1L, 3L))))
  }

  test("a document repeating its own phrase is duplication (self-repeat)") {
    // every 3-gram of the cycle repeats -> one maximal span covering all
    val out = spans((7L, "m n o m n o m n o"))
    assert(out == Map(7L -> ((1L, 9L))))
  }

  test("spans separated by more than n tokens stay separate") {
    val out = spans(
      (0L, "a b c z1 z2 z3 z4 z5 a b c"), // abc at 0 and 8: gap 8 > 3
      (1L, "a b c"))                      // makes abc corpus-duplicated
    assert(out(0L) == ((2L, 6L)))
    assert(out(1L) == ((1L, 3L)))
  }

  test("unique documents emit no rows; short docs are skipped") {
    val out = spans(
      (0L, "all tokens unique here nothing repeats at all"),
      (1L, "x y")) // shorter than one window
    assert(out.isEmpty)
  }

  test("scrub cuts exactly the span tokens and passes clean docs through") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a b c d e f"),     // span [0,3] -> keep "e f"
      (1L, "x a b c y z"),     // span [1,3] -> keep "x y z"
      (2L, "a b c d q1 q2"),   // span [0,3] -> keep "q1 q2"
      (3L, "b c d w1 w2 w3"),  // span [0,2] -> keep "w1 w2 w3"
      (4L, "u1 u2 u3 u4"))     // no spans -> untouched
      .toDF("doc_id", "text")
    val out = Dedup.substringScrub(docs, 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == Map(
      0L -> ((6L, 4L, "e f")),
      1L -> ((6L, 3L, "x y z")),
      2L -> ((6L, 4L, "q1 q2")),
      3L -> ((6L, 3L, "w1 w2 w3")),
      4L -> ((4L, 0L, "u1 u2 u3 u4"))))
  }

  test("a fully duplicated document scrubs to empty text") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "p q r"), (1L, "p q r")).toDF("doc_id", "text")
    val out = Dedup.substringScrub(docs, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out == Map(0L -> ((3L, "")), 1L -> ((3L, ""))))
  }

  test("keep-first scrub keeps the corpus-first copy, cuts the others") {
    val s = spark
    import s.implicits._
    // "p q r" duplicated across docs 0/1/2: doc 0 holds the canonical
    // (min (doc_id, pos)) occurrence and survives untouched; 1 and 2 are
    // scrubbed. Doc 2's trailing self-repeat is a later occurrence too.
    val docs = Seq(
      (0L, "p q r x y"),
      (1L, "a p q r b"),
      (2L, "p q r p q r")).toDF("doc_id", "text")
    val out = Dedup.substringScrubKeepFirst(docs, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out == Map(
      0L -> ((0L, "p q r x y")),
      1L -> ((3L, "a b")),
      2L -> ((6L, ""))))
  }

  test("keep-first scrub equals keep-zero on a corpus with no duplicates") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "one two three four"),
      (1L, "five six seven eight")).toDF("doc_id", "text")
    val a = Dedup.substringScrub(docs, 3).collect().map(_.toSeq).toSet
    val b = Dedup.substringScrubKeepFirst(docs, 3)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  /** brute reference: every duplicated n-gram start, islands merged in
    * plain Scala — the engine's hash-window + window-chain plan must
    * reproduce it on fuzzed corpora
    */
  private def refSpans(texts: Seq[(Long, String)],
                       n: Int): Map[Long, (Long, Long)] = {
    val words = texts.map { case (id, t) => id -> t.trim.split(" ").toSeq }
    val counts = words.flatMap { case (_, w) =>
      if (w.length < n) Nil else w.sliding(n).map(_.mkString(" ")).toSeq }
      .groupBy(identity).view.mapValues(_.size).toMap
    words.flatMap { case (id, w) =>
      val hits = if (w.length < n) Nil
        else w.sliding(n).zipWithIndex
          .collect { case (g, i) if counts(g.mkString(" ")) > 1 => i }
          .toList
      if (hits.isEmpty) Nil
      else {
        // island merge: starts within n of each other share a span
        val spans = hits.tail.foldLeft(List((hits.head, hits.head))) {
          case ((s0, e0) :: rest, p) =>
            if (p - e0 <= n) (s0, p) :: rest else (p, p) :: (s0, e0) :: rest
          case (Nil, p) => List((p, p))
        }
        val covered = spans.map { case (s0, e0) => e0 + n - 1 - s0 + 1 }
        Seq(id -> ((spans.size.toLong, covered.sum.toLong)))
      }
    }.toMap
  }

  test("the streaming scrub kernel's row-local island fold equals the " +
    "batch window merge on fuzzed corpora") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(5, 17)) {
      val rnd = new scala.util.Random(seed)
      val vocab = ('a' to 'e').map(_.toString)
      val texts = (0L until 40L).map { id =>
        id -> (1 + rnd.nextInt(14))
          .to(1, -1).map(_ => vocab(rnd.nextInt(vocab.length)))
          .mkString(" ")
      }
      val docs = texts.toDF("doc_id", "text")
      val dup = Dedup.dupGrams(docs, 3)
      val stream = graft.streaming.DocStream
        .scrubAgainstGrams(docs, dup, 3)
        .collect().map(_.toSeq).toSet
      val batch = Dedup.substringScrub(docs, 3)
        .collect().map(_.toSeq).toSet
      assert(stream == batch, s"seed=$seed")
    }
  }

  /** brute keep-first scrub: canonical (min (doc, pos)) occurrence per
    * duplicated gram exempted, remaining hits island-merged, covered
    * tokens cut — plain Scala, no Spark
    */
  private def refScrubKeepFirst(texts: Seq[(Long, String)],
                                n: Int): Map[Long, (Long, Long, String)] = {
    val words = texts.map { case (id, t) => id -> t.trim.split(" ").toSeq }
    val occs = words.flatMap { case (id, w) =>
      if (w.length < n) Nil
      else w.sliding(n).zipWithIndex
        .map { case (g, i) => (g.mkString(" "), id, i) }.toSeq
    }
    val byGram = occs.groupBy(_._1).filter(_._2.size > 1)
    val nonCanonical = byGram.values.flatMap { os =>
      os.sortBy(o => (o._2, o._3)).tail // canonical = min (doc, pos)
    }.toSeq
    val hitsByDoc = nonCanonical.groupBy(_._2)
      .view.mapValues(_.map(_._3).sorted.toList).toMap
    words.map { case (id, w) =>
      val spans = hitsByDoc.getOrElse(id, Nil) match {
        case Nil => Nil
        case h :: t =>
          t.foldLeft(List((h, h))) {
            case ((s0, e0) :: rest, p) =>
              if (p - e0 <= n) (s0, p) :: rest else (p, p) :: (s0, e0) :: rest
            case (Nil, p) => List((p, p))
          }.map { case (s0, e0) => (s0, e0 + n - 1) }
      }
      val kept = w.zipWithIndex.collect {
        case (tok, i) if !spans.exists(sp => sp._1 <= i && i <= sp._2) => tok
      }
      id -> ((w.length.toLong, (w.length - kept.length).toLong,
        kept.mkString(" ")))
    }.toMap
  }

  test("the streaming keep-first kernel (artifact-carried canonical " +
    "keys) equals the batch scrub on fuzzed corpora") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(13, 37)) {
      val rnd = new scala.util.Random(seed)
      val vocab = ('a' to 'e').map(_.toString)
      val texts = (0L until 40L).map { id =>
        id -> (0 until (3 + rnd.nextInt(16)))
          .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val docs = texts.toDF("doc_id", "text")
      val stream = graft.streaming.DocStream
        .scrubKeepFirstAgainstGrams(docs,
          Dedup.dupGramsWithCanon(docs, 3), 3)
        .collect().map(_.toSeq).toSet
      val batch = Dedup.substringScrubKeepFirst(docs, 3)
        .collect().map(_.toSeq).toSet
      assert(stream == batch, s"seed=$seed")
    }
  }

  test("fuzzed keep-first scrub matches the brute-force reference") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(7, 13, 29)) {
      val rnd = new scala.util.Random(seed)
      val vocab = ('a' to 'e').map(_.toString)
      val texts = (0L until 40L).map { id =>
        id -> (0 until (3 + rnd.nextInt(18)))
          .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val got = Dedup.substringScrubKeepFirst(
          texts.toDF("doc_id", "text"), 3).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got == refScrubKeepFirst(texts, 3), s"seed=$seed")
    }
  }

  test("keep-first scrub survives one gram duplicated ~1e5 times " +
    "(hot-boilerplate skew)") {
    val s = spark
    import s.implicits._
    // one document cycling a 3-token phrase 33 334 times: every window
    // hash repeats ~33k times corpus-wide — under the old row_number()-
    // over-gh plan this was three hot single-task window sorts; the
    // min-struct aggregation combines map-side. Canonical windows are
    // the doc's first three starts, so exactly the leading "h o t"
    // survives and the rest of the cycle is one maximal span.
    val k = 33334
    val hot = Seq.fill(k)("h o t").mkString(" ")
    val docs = Seq((0L, hot), (1L, "u1 u2 u3 u4 u5")).toDF("doc_id", "text")
    val out = Dedup.substringScrubKeepFirst(docs, 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == Map(
      0L -> ((3L * k, 3L * k - 3L, "h o t")),
      1L -> ((5L, 0L, "u1 u2 u3 u4 u5"))))
  }

  test("counts-artifact append equals the full rebuild on fuzzed " +
    "base/delta splits (and the scrub probe agrees)") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(11, 31)) {
      val rnd = new scala.util.Random(seed)
      val vocab = ('a' to 'e').map(_.toString)
      val texts = (0L until 50L).map { id =>
        id -> (0 until (3 + rnd.nextInt(16)))
          .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val all = texts.toDF("doc_id", "text")
      val base = all.where(org.apache.spark.sql.functions
        .col("doc_id") % 3 =!= 0)
      val delta = all.where(org.apache.spark.sql.functions
        .col("doc_id") % 3 === 0)
      val merged = Dedup.gramCountsAppend(Dedup.gramCounts(base, 3),
        delta, 3)
      // the merged counts ARE the full-corpus counts
      val full = Dedup.gramCounts(all, 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = merged.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == full, s"seed=$seed")
      // and spans read against the merged artifact equal the rebuild —
      // including hashes duplicated only ACROSS the base/delta boundary
      val viaAppend = Dedup.substringSpansWith(all,
        Dedup.dupGramsOf(merged), 3).collect().map(_.toSeq).toSet
      val rebuilt = Dedup.substringSpans(all, 3)
        .collect().map(_.toSeq).toSet
      assert(viaAppend == rebuilt, s"seed=$seed")
      // keep-first artifact maintenance: counts add, canonical keys MIN
      // (the unfiltered canon-counts form — a base-unique hash that
      // turns duplicated after the delta still knows its base canonical)
      val mergedCanon = Dedup.gramCountsCanonAppend(
        Dedup.gramCountsCanon(base, 3), delta, 3)
      val kfAppend = Dedup.substringScrubKeepFirstWith(all,
        Dedup.dupGramsWithCanonOf(mergedCanon), 3)
        .collect().map(_.toSeq).toSet
      val kfRebuilt = Dedup.substringScrubKeepFirst(all, 3)
        .collect().map(_.toSeq).toSet
      assert(kfAppend == kfRebuilt, s"seed=$seed")
    }
  }

  test("fuzzed corpora match the brute-force reference") {
    for (seed <- Seq(3, 9, 21)) {
      val rnd = new scala.util.Random(seed)
      val vocab = ('a' to 'f').map(_.toString)
      val texts = (0L until 40L).map { id =>
        id -> (0 until (3 + rnd.nextInt(20)))
          .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val got = spans(texts: _*)
      assert(got == refSpans(texts, 3), s"seed=$seed")
    }
  }
}
