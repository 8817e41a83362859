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
    val rnd = new scala.util.Random(7)
    val words = (0 until 60).map(_ =>
      (0 until (1 + rnd.nextInt(8))).map(_ =>
        if (rnd.nextBoolean()) "a" else "b").mkString).distinct
    val d = docs(words.mkString(" "))
    // learn 3 merges on the fuzz corpus, then replay them with the
    // reference fold and compare segmentations
    val ms = Bpe.merges(d, 3).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val tok = Bpe.tokenized(d, 3, 1000).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    words.foreach { w =>
      var syms = w.split("").toList
      ms.foreach { case (a, b) => syms = refMerge(syms, a, b) }
      assert(tok(w) == syms.mkString(" "),
        s"word $w: engine '${tok(w)}' vs reference '${syms.mkString(" ")}'")
    }
  }

  test("deterministic tie-break on (lhs, rhs) ordering") {
    // 'ab' and 'ba' pairs tie at count 2 → lexicographically (a,b) wins
    val d = docs("ab ab ba ba")
    val m = Bpe.merges(d, 1).collect().head
    assert((m.getString(1), m.getString(2)) == (("a", "b")))
  }
}
