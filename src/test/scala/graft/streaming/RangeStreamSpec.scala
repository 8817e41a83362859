package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Online radius search against the packed LSH bucket index: the
  * stateless probe must agree bit-for-bit with the batch
  * [[graft.pipeline.Similarity.rangeSearchLsh]] on the same
  * (corpus, queries) — same bucket hash, same fixed-point cosine, same
  * threshold — and run as an actual stateless stream.
  */
class RangeStreamSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"
  private val (bits, dim, minCos) = (4, 64, 0.1)

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

  test("packed-bucket probe ≡ batch rangeSearchLsh with every vector as query") {
    val packed = SimStream.lshIndex(emb, bits, dim)
    val st = SimStream.rangeAgainstLshIndex(
        emb.select("vec_id", "embedding"), packed, bits, dim, minCos)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = graft.pipeline.Similarity.rangeSearchLsh(emb, emb, bits, dim,
        minCos)
      .select("query_id", "vec_id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(st.nonEmpty)
    assert(st == b, s"stream-only=${(st -- b).take(5)} " +
      s"batch-only=${(b -- st).take(5)}")
  }

  test("in-row RRF fusion ≡ batch rrfFuse with every vector as query") {
    val e = emb
    val (packedIvf, cents) = SimStream.ivfIndex(e, nCells = 8)
    val packedLsh = SimStream.lshIndex(e, bits = 6, dim = 64)
    val st = SimStream.rrfAgainstIndexes(e.select("vec_id", "embedding"),
        packedIvf, cents, packedLsh, bits = 6, dim = 64, kEach = 10, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val b = graft.pipeline.Similarity.rrfFuse(
        graft.pipeline.Similarity.ivfTopK(e, e, nCells = 8, dim = 64,
          k = 10),
        graft.pipeline.Similarity.lshTopK(e, e, bits = 6, dim = 64,
          k = 10), k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    graft.core.Caches.releaseTransient(spark)
    assert(st.nonEmpty)
    assert(st == b, s"stream-only=${(st -- b).take(5)} " +
      s"batch-only=${(b -- st).take(5)}")
  }

  test("RRF: a query whose LSH bucket is unpopulated still gets its " +
    "IVF-side list (left-join + coalesce, not an inner-join drop)") {
    val e = emb
    val (packedIvf, cents) = SimStream.ivfIndex(e, nCells = 8)
    // build the LSH index from the corpus MINUS vec 0's own bucket, so
    // vec 0 probes an absent bucket row — the regression case: an inner
    // join here used to drop the query entirely
    val b0 = e.where(col("vec_id") === 0)
      .select(graft.pipeline.VectorOps.lshBucket(col("embedding"), 6, 64))
      .head().getLong(0)
    val lshCorpus = e.where(
      graft.pipeline.VectorOps.lshBucket(col("embedding"), 6, 64) =!= b0)
    val packedLsh = SimStream.lshIndex(lshCorpus, bits = 6, dim = 64)
    val q0 = e.where(col("vec_id") === 0).select("vec_id", "embedding")
    val st = SimStream.rrfAgainstIndexes(q0, packedIvf, cents, packedLsh,
        bits = 6, dim = 64, kEach = 10, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val b = graft.pipeline.Similarity.rrfFuse(
        graft.pipeline.Similarity.ivfTopK(e, q0, nCells = 8, dim = 64,
          k = 10),
        graft.pipeline.Similarity.lshTopK(lshCorpus, q0, bits = 6,
          dim = 64, k = 10), k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    graft.core.Caches.releaseTransient(spark)
    assert(st.nonEmpty, "query was dropped despite a populated IVF cell")
    assert(st == b, s"stream-only=${(st -- b).take(5)} " +
      s"batch-only=${(b -- st).take(5)}")
  }

  test("runs stateless; a query below threshold everywhere emits nothing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val packed = SimStream.lshIndex(emb, bits, dim)
    val queries = emb.where(col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val in = MemoryStream[(Long, Seq[Float])]
    val out = SimStream.rangeAgainstLshIndex(
      in.toDF().toDF("vec_id", "embedding"), packed, bits, dim, minCos)
    val q = out.writeStream.format("memory").queryName("srange")
      .outputMode("append").start()
    in.addData(queries: _*)
    q.processAllAvailable()
    val n1 = spark.table("srange").count()
    // a second arrival of the same queries re-answers them (no dedup
    // state to suppress the rows — genuinely stateless)
    in.addData(queries.head)
    q.processAllAvailable()
    val n2 = spark.table("srange").count()
    assert(q.lastProgress.stateOperators.isEmpty)
    q.stop()
    val b = graft.pipeline.Similarity.rangeSearchLsh(
      emb, emb.where(col("vec_id") < 5), bits, dim, minCos).count()
    assert(n1 == b)
    val firstCount = graft.pipeline.Similarity.rangeSearchLsh(
      emb, emb.where(col("vec_id") === queries.head._1), bits, dim,
      minCos).count()
    assert(n2 == n1 + firstCount)
  }
}
