package graft.expr

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the native [[SimhashFp]] kernel against the composed DataFrame
  * formulation it replaced (split(trim(text), " ") → explode → one md5
  * per word → hex halves as ±1 votes per bit → sign bits packed per
  * half) — the same parity discipline MinShingleMd5Spec applies to its
  * kernel. The composed form IS the semantics contract (it is what the
  * DuckDB oracle mirrors), so the native expression must agree on every
  * input, in particular the edges the generated gate corpus may never
  * exercise: empty and whitespace-only text (one empty word), consecutive
  * spaces (empty words BETWEEN real ones), single word, leading/trailing
  * spaces (trimmed), non-space whitespace (NOT a delimiter, NOT trimmed),
  * and multibyte UTF-8 — including U+00A0 whose second byte is 0xA0, the
  * byte-level tokenizer's interesting case (0x20 never occurs inside a
  * UTF-8 multibyte sequence, which is what makes byte slicing correct).
  */
class SimhashFpSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** the pre-round-9 explode + groupBy formulation, reconstructed */
  private def composedSimhash(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(trim(col("text")), " ", -1)).as("word"))
    val hv = words.select(col("doc_id"),
      expr("CAST(conv(substring(md5(word), 1, 8), 16, 10) AS BIGINT)").as("hv_hi"),
      expr("CAST(conv(substring(md5(word), 9, 8), 16, 10) AS BIGINT)").as("hv_lo"))
    val aggs =
      (0 until 32).map(j => expr(
        s"SUM(CASE WHEN (hv_hi >> $j) & 1 = 1 THEN 1 ELSE -1 END)").as(s"a$j")) ++
      (0 until 32).map(j => expr(
        s"SUM(CASE WHEN (hv_lo >> $j) & 1 = 1 THEN 1 ELSE -1 END)").as(s"b$j"))
    val sums = hv.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    def fold(tag: String) = expr((0 until 32)
      .map(j => s"(CASE WHEN $tag$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + "))
    sums.select(col("doc_id"), fold("a").as("fp_hi"), fold("b").as("fp_lo"))
  }

  private def nativeSimhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), SimhashFp(col("text")).as("fp"))
      .select(col("doc_id"), col("fp").getItem(0).as("fp_hi"),
        col("fp").getItem(1).as("fp_lo"))

  private def assertParity(docs: DataFrame): Unit = {
    val native = nativeSimhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val composed = composedSimhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(native.length == composed.length,
      s"row count: native ${native.length} vs composed ${composed.length}")
    native.zip(composed).foreach { case (n, c) =>
      assert(n == c, s"fingerprint mismatch at doc ${n._1}: native $n vs composed $c")
    }
  }

  test("native kernel matches the composed formulation on adversarial inputs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      1L -> "",                       // one empty word
      2L -> "   ",                    // trims to one empty word
      3L -> "a  b",                   // empty word between real ones
      4L -> "one",                    // single word
      5L -> "  lead",                 // leading spaces trimmed
      6L -> "trail  ",                // trailing spaces trimmed
      7L -> "a\tb",                   // tab: not a delimiter, one word
      8L -> "\tx ",                   // tab survives trim (0x20 only)
      9L -> "héllo wörld",  // 2-byte UTF-8 sequences
      10L -> "你好 世界 你好", // CJK, repeated word
      11L -> "x y z",            // U+00A0: 0xA0 continuation byte
      12L -> ("lorem ipsum " * 50).trim, // long doc, repeated vocabulary
      13L -> "a a a b"                // vote ties broken by majority
    ).toDF("doc_id", "text")
    assertParity(docs)
  }

  test("native kernel matches the composed formulation on the corpus") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    assertParity(docs)
  }
}
