package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The online admission capstone's state semantics: verdicts are
  * deterministic inside a micro-batch ((ts, doc_id) order picks the
  * canonical copy), the dup leg carries state ACROSS micro-batches, and
  * state evicts on event time — a duplicate arriving after its hash's
  * retention window is judged fresh, which is the within-watermark
  * contract (same as dedupExact), not a bug.
  */
class DecisionsSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  // quality ~0.0 text (no stopwords, no punct credit beyond formula) vs a
  // stopword-rich HIGH quality text; threshold 0.46 as in the gate
  private val LowQ = "zzz yyy xxx www vvv"
  private val HighQ = "the a is of to the a is of to."

  private def run(batches: Seq[Seq[(Long, Long, String)]],
                  retainMs: Long = 60000L): Map[Long, String] = {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String)]
    val docs = in.toDF().toDF("tsMs", "doc_id", "text")
      .withColumn("ts", timestamp_millis(col("tsMs")))
      .select("ts", "doc_id", "text")
    val out = DocStream.decisions(docs, "1 second", retainMs, 0.46)
    val name = s"dec_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    val res = spark.table(name).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    q.stop()
    res
  }

  test("in-batch dup resolution is (ts, doc_id)-deterministic; quality judges the canonical copy") {
    val r = run(Seq(Seq(
      (1000L, 2L, HighQ), (1000L, 1L, HighQ), // same ts: doc 1 wins
      (2000L, 3L, LowQ))))
    assert(r(1L) == "kept" && r(2L) == "dup")
    assert(r(3L) == "low_quality")
  }

  test("dup state carries across micro-batches") {
    val r = run(Seq(
      Seq((1000L, 1L, HighQ)),
      Seq((3000L, 2L, HighQ)))) // later batch, same text, within retention
    assert(r(1L) == "kept" && r(2L) == "dup")
  }

  test("event-time eviction: a duplicate past retention is judged fresh") {
    val r = run(Seq(
      Seq((1000L, 1L, LowQ)),
      // advance the watermark far past 1000 + retainMs so the hash evicts
      Seq((200000L, 2L, HighQ)),
      Seq((300000L, 3L, LowQ))), retainMs = 5000L)
    assert(r(1L) == "low_quality")
    // doc 3 repeats doc 1's text but its state evicted — judged fresh
    assert(r(3L) == "low_quality",
      s"expected fresh verdict after eviction, got ${r(3L)}")
  }
}
