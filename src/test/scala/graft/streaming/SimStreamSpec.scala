package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Online ANN against the packed IVF index: the row-local search must
  * agree bit-for-bit with the batch [[graft.pipeline.Similarity.ivfTopK]]
  * on the same (corpus, queries) — same fixed-point cosine, same argmax
  * and ranking tie-breaks — and run as an actual stateless stream.
  */
class SimStreamSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb = graft.core.Tables(spark, dir, "embeddings")

  test("packed-index row-local search ≡ batch ivfTopK on the real corpus") {
    // EVERY corpus vector as a query — cells of all sizes, ties included
    val (packed, cents) = SimStream.ivfIndex(emb, nCells = 8)
    val st = SimStream.topKAgainstIvfIndex(
        emb.select("vec_id", "embedding"), packed, cents, k = 5)
      .select("query_id", "vec_id", "cos", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val b = graft.pipeline.Similarity.ivfTopK(
        emb, emb, nCells = 8, dim = 64, k = 5)
      .select("query_id", "vec_id", "cos", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    graft.core.Caches.releaseTransient(spark)
    assert(st.nonEmpty)
    assert(st == b, s"stream-only=${(st -- b).take(5)} " +
      s"batch-only=${(b -- st).take(5)}")
  }

  test("runs as a stateless stream: results per micro-batch, no state store") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val (packed, cents) = SimStream.ivfIndex(emb, nCells = 8)
    val queries = emb.where(col("vec_id").isin(10L, 11L, 12L))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val in = MemoryStream[(Long, Seq[Float])]
    val out = SimStream.topKAgainstIvfIndex(
      in.toDF().toDF("vec_id", "embedding"), packed, cents, k = 5)
    val q = out.writeStream.format("memory").queryName("ssim")
      .outputMode("append").start()
    in.addData(queries.head)
    q.processAllAvailable()
    val afterFirst = spark.table("ssim").count()
    in.addData(queries.tail: _*)
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT query_id, vec_id, rank FROM ssim ORDER BY query_id, rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(q.lastProgress.stateOperators.isEmpty) // genuinely stateless
    q.stop()
    assert(afterFirst == 5) // first query answered in its own micro-batch
    val b = graft.pipeline.Similarity.ivfTopK(emb,
        emb.where(col("vec_id").isin(10L, 11L, 12L)), 8, 64, 5)
      .select("query_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      .sorted
    graft.core.Caches.releaseTransient(spark)
    assert(rows.toSeq.sorted == b)
  }
}
