package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.Similarity

/** Quantized packed-index search: the stateless stream kernel must match
  * the batch quantized-only ranking bit-for-bit, and its index must carry
  * int8 codes (the 4× residency claim), not float embeddings.
  */
class SimStreamSq8Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"
  private val NCells = 8

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("query_id", "vec_id", "cos", "rank").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    .toSet

  test("packed sq8 search ≡ batch ivfSq8QuantTopK on every corpus vector") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, cents) = SimStream.sq8Index(emb, NCells)
    val queries = emb.select("vec_id", "embedding")
    val st = rows(SimStream.topKAgainstSq8Index(queries, packed, cents, 5))
    val b = rows(Similarity.ivfSq8QuantTopK(emb, queries, NCells, 64, 5))
    assert(st.nonEmpty && st == b, {
      val d1 = (st -- b).take(3); val d2 = (b -- st).take(3)
      s"stream-only=$d1 batch-only=$d2"
    })
  }

  test("probed sq8 search ≡ batch ivfSq8QuantTopKProbed; nProbe=1 ≡ single") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, cents) = SimStream.sq8Index(emb, NCells)
    val queries = emb.where(col("vec_id") < 50).select("vec_id", "embedding")
    for (p <- Seq(2, 3)) {
      val st = rows(SimStream.topKAgainstSq8IndexProbed(
        queries, packed, cents, k = 5, nProbe = p))
      val b = rows(Similarity.ivfSq8QuantTopKProbed(
        emb, queries, NCells, 64, k = 5, nProbe = p))
      assert(st.nonEmpty && st == b, {
        val d1 = (st -- b).take(3); val d2 = (b -- st).take(3)
        s"nProbe=$p stream-only=$d1 batch-only=$d2"
      })
    }
    val p1 = rows(SimStream.topKAgainstSq8IndexProbed(
      queries, packed, cents, k = 5, nProbe = 1))
    assert(p1 == rows(SimStream.topKAgainstSq8Index(
      queries, packed, cents, k = 5)))
  }

  test("reranked sq8 search ≡ batch ivfSq8TopK at the same (k, rerank)") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packedQ, cents) = SimStream.sq8Index(emb, NCells)
    val (packedF, _) = SimStream.ivfIndex(emb, NCells)
    val queries = emb.where(col("vec_id") < 50).select("vec_id", "embedding")
    for (rr <- Seq(5, 15)) {
      val st = rows(SimStream.topKAgainstSq8IndexReranked(
        queries, packedQ, packedF, cents, k = 5, rerank = rr))
      val b = rows(Similarity.ivfSq8TopK(emb, queries, NCells, 64, 5, rr))
      assert(st.nonEmpty && st == b, {
        val d1 = (st -- b).take(3); val d2 = (b -- st).take(3)
        s"rerank=$rr stream-only=$d1 batch-only=$d2"
      })
    }
  }

  test("the packed index stores byte codes, no float embeddings") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, _) = SimStream.sq8Index(emb, NCells)
    val cand = packed.schema("cands").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(cand("code").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, false) ||
      cand("code").dataType.asInstanceOf[
        org.apache.spark.sql.types.ArrayType].elementType ==
        org.apache.spark.sql.types.ByteType)
    assert(!cand.fieldNames.contains("embedding"),
      "packed sq8 index must not carry the full-precision vectors")
  }

  test("sq8 search runs as a stateless stream") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, cents) = SimStream.sq8Index(emb, NCells)
    val base = emb.where(col("vec_id").isin(10L, 11L, 12L))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val queries = in.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = SimStream.topKAgainstSq8Index(queries, packed, cents, 5)
    val q = out.writeStream.format("memory").queryName("sim_sq8")
      .outputMode("append").start()
    in.addData(base.toSeq: _*)
    q.processAllAvailable()
    val st = Option(q.lastProgress).map(_.stateOperators.length).getOrElse(-1)
    val n = spark.sql("SELECT COUNT(*) FROM sim_sq8").collect()(0).getLong(0)
    q.stop()
    assert(st == 0, s"expected stateless plan, got $st stateful operators")
    assert(n == 15, s"expected 3 queries x k=5 rows, got $n")
  }

  test("reranked sq8 search runs as a stateless stream") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packedQ, cents) = SimStream.sq8Index(emb, NCells)
    val (packedF, _) = SimStream.ivfIndex(emb, NCells)
    val base = emb.where(col("vec_id").isin(10L, 11L, 12L))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val queries = in.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = SimStream.topKAgainstSq8IndexReranked(
      queries, packedQ, packedF, cents, k = 5, rerank = 15)
    val q = out.writeStream.format("memory").queryName("sim_sq8_rr")
      .outputMode("append").start()
    in.addData(base.toSeq: _*)
    q.processAllAvailable()
    val st = Option(q.lastProgress).map(_.stateOperators.length).getOrElse(-1)
    val n = spark.sql("SELECT COUNT(*) FROM sim_sq8_rr").collect()(0).getLong(0)
    q.stop()
    assert(st == 0, s"expected stateless plan, got $st stateful operators")
    assert(n == 15, s"expected 3 queries x k=5 rows, got $n")
  }
}
