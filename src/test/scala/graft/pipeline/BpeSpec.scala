package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** BPE merge training: the window-rule merge application must equal the
  * reference greedy left-to-right fold (including the self-pair overlap
  * cases), merges must pick the max-count pair with deterministic ties,
  * and counts must be corpus-frequency-weighted.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def docs(texts: String*) = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  /** reference greedy LTR merge fold */
  private def refMerge(syms: List[String], a: String,
                       b: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("first merge picks the weighted max pair; counts include " +
    "overlapping adjacencies") {
    // 'aaa' contributes TWO (a,a) adjacencies per occurrence
    val d = docs("aaa aaa ab", "ab ab")
    val m = Bpe.merges(d, 1).collect().head
    assert((m.getString(1), m.getString(2)) == (("a", "a")))
    assert(m.getLong(4) == 4L) // two 'aaa' × two pairs each
  }

  test("self-pair merge is greedy non-overlapping: aaaa -> (aa)(aa)," +
    " aaa -> (aa)a") {
    val d = docs("aaaa aaa")
    val tok = Bpe.tokenized(d, 1, 10).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(tok("aaaa") == "aa aa")
    assert(tok("aaa") == "aa a")
  }

  test("merge application equals the reference fold over fuzzed words") {
    // multi-seed, multi-alphabet, multi-depth: every distinct fuzz word's
    // engine segmentation replayed against the reference greedy fold
    for ((seed, alpha, depth) <- Seq((7, "ab", 3), (11, "ab", 5),
        (13, "abc", 3), (17, "abc", 4), (23, "ab", 4))) {
      val rnd = new scala.util.Random(seed)
      val words = (0 until 300).map(_ =>
        (0 until (1 + rnd.nextInt(10))).map(_ =>
          alpha(rnd.nextInt(alpha.length)).toString).mkString).distinct
      val d = docs(words.mkString(" "))
      val ms = Bpe.merges(d, depth).collect()
        .map(r => (r.getString(1), r.getString(2)))
      val tok = Bpe.tokenized(d, depth, 10000).collect()
        .map(r => r.getString(0) -> r.getString(3)).toMap
      words.foreach { w =>
        var syms = w.split("").toList
        ms.foreach { case (a, b) => syms = refMerge(syms, a, b) }
        assert(tok(w) == syms.mkString(" "),
          s"seed=$seed depth=$depth word $w: engine '${tok(w)}' vs " +
            s"reference '${syms.mkString(" ")}'")
      }
    }
  }

  test("encode applies TRAINED rules to unseen text: window chain ≡ " +
    "reference fold replay, and training sees only the train slice") {
    val train = docs("aa aa ab ba", "aab aab bb")
    val unseen = docs("aaba abab bbbb", "aaaa xyab")
    val ms = Bpe.merges(train, 3).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val enc = Bpe.encode(train, unseen, 3, 100).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    val unseenWords = Seq("aaba", "abab", "bbbb", "aaaa", "xyab")
    assert(enc.keySet == unseenWords.toSet)
    unseenWords.foreach { w =>
      var syms = w.split("").toList
      ms.foreach { case (a, b) => syms = refMerge(syms, a, b) }
      assert(enc(w) == syms.mkString(" "),
        s"word $w: engine '${enc(w)}' vs reference '${syms.mkString(" ")}'")
    }
  }

  test("encodeCounts (the stream kernel's row-local fold) matches the " +
    "window-chain segmentation lengths per document") {
    val train = docs("aa aa ab ba aab bb")
    val unseen = docs("aaba abab", "bbbb aaaa aaba", "   ")
    val rules = Bpe.trainedRules(train, 3)
    val got = Bpe.encodeCounts(unseen, rules).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val ms = rules
    def nTok(w: String): Long = {
      var syms = w.split("").toList
      ms.foreach { case (a, b) => syms = refMerge(syms, a, b) }
      syms.length.toLong
    }
    // doc 2 is whitespace-only → dropped
    assert(got.toSeq == Seq(
      (0L, 2L, nTok("aaba") + nTok("abab")),
      (1L, 3L, nTok("bbbb") + nTok("aaaa") + nTok("aaba"))))
  }

  test("deterministic tie-break on (lhs, rhs) ordering") {
    // 'ab' and 'ba' pairs tie at count 2 → lexicographically (a,b) wins
    val d = docs("ab ab ba ba")
    val m = Bpe.merges(d, 1).collect().head
    assert((m.getString(1), m.getString(2)) == (("a", "b")))
  }

  test("k beyond the learnable merges yields a shorter rule list, " +
    "not a crash") {
    // 'ab' exhausts after 1 merge (every word one symbol); k=5 must
    // degrade to the 1 learnable rule and encode must still work
    val d = docs("ab ab ab")
    val m = Bpe.merges(d, 5).collect()
    assert(m.length == 1)
    assert((m(0).getString(1), m(0).getString(2)) == (("a", "b")))
    val tok = Bpe.tokenized(d, 5, 10).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(tok("ab") == "ab")
  }

  test("single-character vocabulary (zero learnable merges) trains an " +
    "empty rule table") {
    val d = docs("a b a b", "b a")
    assert(Bpe.merges(d, 3).collect().isEmpty)
  }
}
