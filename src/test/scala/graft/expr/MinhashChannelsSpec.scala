package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The native per-doc signature kernel must be indistinguishable from
  * the composed derivation it replaced on the hot path: shingle explode
  * → md5(concat_ws('|', seed, shingle)) → per-channel 8-hex-char minima
  * — fuzzed over corpora with the split edge cases (multi-space runs
  * keep empty fields, leading/trailing spaces trim, multibyte words),
  * for both shingle widths the dedup family uses.
  */
class MinhashChannelsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val Seeds = graft.pipeline.Dedup.Seeds
  private val Channels = graft.pipeline.Dedup.Channels

  /** the composed reference: explode shingles, md5 per seed, hex-substr
    * channel minima parsed to longs
    */
  private def composed(docs: org.apache.spark.sql.DataFrame,
                       n: Int): Map[Long, Seq[Long]] = {
    val w = split(trim(col("text")), " ")
    val idx = (0 until n).map(i => s"w[i+$i]").mkString(", ")
    val sh = docs.select(col("doc_id"), w.as("w"))
      .where(size(col("w")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(w)-$n), i -> concat_ws(' ', $idx))"))
        .as("shingle"))
    val hashed = sh.select(col("doc_id") +:
      (0 until Seeds).map(s =>
        md5(concat_ws("|", lit(s.toString), col("shingle"))).as(s"h$s")): _*)
    val aggs = for (s <- 0 until Seeds; c <- 0 until Channels)
      yield min(conv(substring(col(s"h$s"), c * 8 + 1, 8), 16, 10)
        .cast("long")).as(s"mh${s}_$c")
    hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) ->
        (1 until Seeds * Channels + 1).map(r.getLong(_)).toSeq).toMap
  }

  private def native(docs: org.apache.spark.sql.DataFrame,
                     n: Int): Map[Long, Seq[Long]] = {
    val mh = org.apache.spark.sql.GraftBridge.column(
      MinhashChannels(org.apache.spark.sql.GraftBridge
        .expression(col("text")), n, Seeds, Channels))
    docs.select(col("doc_id"), mh.as("mh"))
      .where(col("mh").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
  }

  test("fuzzed corpora: native kernel == composed signature, both " +
    "shingle widths, split edges included") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(5, 17)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Seq("aa", "b", "cc", "déjà", "e", "日本", "gg")
      val texts = (0L until 60L).map { id =>
        val base = (0 until rnd.nextInt(9))
          .map(_ => vocab(rnd.nextInt(vocab.length)))
        val raw = base.mkString(" ")
        // inject split edge cases: double spaces, leading/trailing pads
        val t = rnd.nextInt(4) match {
          case 0 => raw.replaceFirst(" ", "  ")
          case 1 => "  " + raw
          case 2 => raw + " "
          case _ => raw
        }
        id -> t
      }
      val df = texts.toDF("doc_id", "text")
      for (n <- Seq(2, 3)) {
        val got = native(df, n)
        val ref = composed(df, n)
        assert(got == ref, s"seed=$seed n=$n")
      }
    }
  }

  test("edges: empty text and fewer-than-n words are NULL (absent), " +
    "single shingle works") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, ""), (1L, "one two"), (2L, "one two three"),
      (3L, "   ")).toDF("doc_id", "text")
    val got = native(df, 3)
    assert(got.keySet == Set(2L))
    assert(got(2L) == composed(df, 3)(2L))
  }
}
