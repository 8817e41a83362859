package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.Similarity

/** Product-quantized packed-index search: the stateless stream kernel
  * must match the batch PQ ranking bit-for-bit, and its index must carry
  * only the integer code words (the 32× residency claim), not float
  * embeddings or sq8 grids.
  */
class SimStreamPqSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"
  private val NCells = 8
  private val M = 8
  private val Ksub = 16
  private val Dim = 64

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

  test("packed PQ search ≡ batch ivfPqTopK on every corpus vector") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, cents, cbs) = SimStream.pqIndex(emb, NCells, M, Ksub, Dim)
    val queries = emb.select("vec_id", "embedding")
    val st = rows(SimStream.topKAgainstPqIndex(
      queries, packed, cents, cbs, k = 5, m = M, dim = Dim))
    val b = rows(Similarity.ivfPqTopK(emb, queries, NCells, M, Ksub, Dim, 5))
    assert(st.nonEmpty && st == b, {
      val d1 = (st -- b).take(3); val d2 = (b -- st).take(3)
      s"stream-only=$d1 batch-only=$d2"
    })
  }

  test("probed PQ search ≡ batch ivfPqTopKProbed at nProbe ∈ {1, 3}; " +
    "nProbe=1 ≡ the single-cell kernel") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, cents, cbs) = SimStream.pqIndex(emb, NCells, M, Ksub, Dim)
    val queries = emb.select("vec_id", "embedding")
    for (nProbe <- Seq(1, 3)) {
      val st = rows(SimStream.topKAgainstPqIndexProbed(
        queries, packed, cents, cbs, k = 5, m = M, dim = Dim,
        nProbe = nProbe))
      val b = rows(Similarity.ivfPqTopKProbed(emb, queries, NCells, M, Ksub,
        Dim, k = 5, nProbe = nProbe))
      assert(st.nonEmpty && st == b, {
        val d1 = (st -- b).take(3); val d2 = (b -- st).take(3)
        s"nProbe=$nProbe stream-only=$d1 batch-only=$d2"
      })
    }
    val p1 = rows(SimStream.topKAgainstPqIndexProbed(
      queries, packed, cents, cbs, k = 5, m = M, dim = Dim, nProbe = 1))
    val s1 = rows(SimStream.topKAgainstPqIndex(
      queries, packed, cents, cbs, k = 5, m = M, dim = Dim))
    assert(p1 == s1, "nProbe=1 must reproduce the single-cell kernel")
  }

  test("reranked PQ search ≡ batch ivfPqRerankTopK at rerank ∈ {5, 15}") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, cents, cbs) = SimStream.pqIndex(emb, NCells, M, Ksub, Dim)
    val (packedFull, _) = SimStream.ivfIndex(emb, NCells)
    val queries = emb.select("vec_id", "embedding")
    for (rerank <- Seq(5, 15)) {
      val st = rows(SimStream.topKAgainstPqIndexReranked(
        queries, packed, packedFull, cents, cbs, k = 5, m = M, dim = Dim,
        rerank = rerank))
      val b = rows(Similarity.ivfPqRerankTopK(emb, queries, NCells, M, Ksub,
        Dim, k = 5, rerank = rerank))
      assert(st.nonEmpty && st == b, {
        val d1 = (st -- b).take(3); val d2 = (b -- st).take(3)
        s"rerank=$rerank stream-only=$d1 batch-only=$d2"
      })
    }
  }

  test("probed+reranked PQ search ≡ batch ivfPqRerankTopKProbed at " +
    "nProbe ∈ {1, 3}; nProbe=1 ≡ the single-cell reranked kernel") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, cents, cbs) = SimStream.pqIndex(emb, NCells, M, Ksub, Dim)
    val (packedFull, _) = SimStream.ivfIndex(emb, NCells)
    val queries = emb.select("vec_id", "embedding")
    for (nProbe <- Seq(1, 3)) {
      val st = rows(SimStream.topKAgainstPqIndexProbedReranked(
        queries, packed, packedFull, cents, cbs, k = 5, m = M, dim = Dim,
        rerank = 15, nProbe = nProbe))
      val b = rows(Similarity.ivfPqRerankTopKProbed(emb, queries, NCells,
        M, Ksub, Dim, k = 5, rerank = 15, nProbe = nProbe))
      assert(st.nonEmpty && st == b, {
        val d1 = (st -- b).take(3); val d2 = (b -- st).take(3)
        s"nProbe=$nProbe stream-only=$d1 batch-only=$d2"
      })
    }
    val p1 = rows(SimStream.topKAgainstPqIndexProbedReranked(
      queries, packed, packedFull, cents, cbs, k = 5, m = M, dim = Dim,
      rerank = 15, nProbe = 1))
    val r1 = rows(SimStream.topKAgainstPqIndexReranked(
      queries, packed, packedFull, cents, cbs, k = 5, m = M, dim = Dim,
      rerank = 15))
    assert(p1 == r1, "nProbe=1 must reproduce the single-cell reranked kernel")
  }

  test("reranked PQ search runs as a stateless stream") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, cents, cbs) = SimStream.pqIndex(emb, NCells, M, Ksub, Dim)
    val (packedFull, _) = SimStream.ivfIndex(emb, NCells)
    val base = emb.where(col("vec_id").isin(10L, 11L, 12L))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val queries = in.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = SimStream.topKAgainstPqIndexReranked(queries, packed,
      packedFull, cents, cbs, k = 5, m = M, dim = Dim, rerank = 15)
    assert(out.columns.toSeq == Seq("query_id", "vec_id", "cos", "rank"),
      s"unexpected output columns: ${out.columns.mkString(",")}")
    val q = out.writeStream.format("memory").queryName("sim_pq_rr")
      .outputMode("append").start()
    in.addData(base.toSeq: _*)
    q.processAllAvailable()
    val st = Option(q.lastProgress).map(_.stateOperators.length).getOrElse(-1)
    val n = spark.sql("SELECT COUNT(*) FROM sim_pq_rr").collect()(0).getLong(0)
    q.stop()
    assert(st == 0, s"expected stateless plan, got $st stateful operators")
    assert(n == 15, s"expected 3 queries x k=5 rows, got $n")
  }

  test("the packed index stores integer code words only") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, _, _) = SimStream.pqIndex(emb, NCells, M, Ksub, Dim)
    val cand = packed.schema("cands").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(cand("codes").dataType.asInstanceOf[
      org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.IntegerType)
    assert(cand.fieldNames.toSet == Set("vec_id", "codes"),
      "packed PQ index must carry nothing but the code words")
  }

  test("PQ search runs as a stateless stream and drops the codebook column") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, cents, cbs) = SimStream.pqIndex(emb, NCells, M, Ksub, Dim)
    val base = emb.where(col("vec_id").isin(10L, 11L, 12L))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val queries = in.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = SimStream.topKAgainstPqIndex(queries, packed, cents, cbs,
      k = 5, m = M, dim = Dim)
    assert(out.columns.toSeq == Seq("query_id", "vec_id", "cos", "rank"),
      s"unexpected output columns: ${out.columns.mkString(",")}")
    val q = out.writeStream.format("memory").queryName("sim_pq")
      .outputMode("append").start()
    in.addData(base.toSeq: _*)
    q.processAllAvailable()
    val st = Option(q.lastProgress).map(_.stateOperators.length).getOrElse(-1)
    val n = spark.sql("SELECT COUNT(*) FROM sim_pq").collect()(0).getLong(0)
    q.stop()
    assert(st == 0, s"expected stateless plan, got $st stateful operators")
    assert(n == 15, s"expected 3 queries x k=5 rows, got $n")
  }
}
