package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.Similarity

/** Residual-PQ (IVFADC) packed-index search: the stateless stream kernel
  * — with its per-(query, cell) ADC tables built AFTER the cell join —
  * must match the batch residual ranking bit-for-bit, stay stateless,
  * and keep the resident index codes-only (the per-cell shifted
  * codebooks live in a separate small artifact, not per member).
  */
class SimStreamResidualSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("residual search ≡ batch ivfPqResidualTopKProbed at nProbe ∈ {1, 3}; " +
    "nProbe=1 ≡ the single-cell kernel") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, cents, scbL) =
      SimStream.residualPqIndex(emb, NCells, M, Ksub, Dim)
    val queries = emb.select("vec_id", "embedding")
    for (nProbe <- Seq(1, 3)) {
      val st = rows(SimStream.topKAgainstResidualPqIndexProbed(
        queries, packed, cents, scbL, k = 5, m = M, dim = Dim,
        nProbe = nProbe))
      val b = rows(Similarity.ivfPqResidualTopKProbed(emb, queries, NCells,
        M, Ksub, Dim, k = 5, nProbe = nProbe))
      assert(st.nonEmpty && st == b, {
        val d1 = (st -- b).take(3); val d2 = (b -- st).take(3)
        s"nProbe=$nProbe stream-only=$d1 batch-only=$d2"
      })
    }
    val p1 = rows(SimStream.topKAgainstResidualPqIndexProbed(
      queries, packed, cents, scbL, k = 5, m = M, dim = Dim, nProbe = 1))
    val s1 = rows(SimStream.topKAgainstResidualPqIndex(
      queries, packed, cents, scbL, k = 5, m = M, dim = Dim))
    assert(p1 == s1, "nProbe=1 must reproduce the single-cell kernel")
  }

  test("residual probed+reranked search ≡ batch at nProbe ∈ {1, 3}") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, cents, scbL) =
      SimStream.residualPqIndex(emb, NCells, M, Ksub, Dim)
    val (packedF, _) = SimStream.ivfIndex(emb, NCells)
    val queries = emb.select("vec_id", "embedding")
    for (nProbe <- Seq(1, 3)) {
      val st = rows(SimStream.topKAgainstResidualPqIndexProbedReranked(
        queries, packed, packedF, cents, scbL, k = 5, m = M, dim = Dim,
        rerank = 15, nProbe = nProbe))
      val b = rows(Similarity.ivfPqResidualRerankTopKProbed(emb, queries,
        NCells, M, Ksub, Dim, k = 5, rerank = 15, nProbe = nProbe))
      assert(st.nonEmpty && st == b, {
        val d1 = (st -- b).take(3); val d2 = (b -- st).take(3)
        s"nProbe=$nProbe stream-only=$d1 batch-only=$d2"
      })
    }
  }

  test("residual search runs as a stateless stream, codes-only index") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val (packed, cents, scbL) =
      SimStream.residualPqIndex(emb, NCells, M, Ksub, Dim)
    // the resident index carries nothing but the code words; the shifted
    // codebooks are a separate nCells-row artifact
    val cand = packed.schema("cands").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(cand.fieldNames.toSet == Set("vec_id", "codes"),
      "packed residual index must carry nothing but the code words")
    val base = emb.where(col("vec_id").isin(10L, 11L, 12L))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val queries = in.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = SimStream.topKAgainstResidualPqIndexProbed(queries, packed,
      cents, scbL, k = 5, m = M, dim = Dim, nProbe = 3)
    assert(out.columns.toSeq == Seq("query_id", "vec_id", "cos", "rank"),
      s"unexpected output columns: ${out.columns.mkString(",")}")
    val q = out.writeStream.format("memory").queryName("sim_pq_res")
      .outputMode("append").start()
    in.addData(base.toSeq: _*)
    q.processAllAvailable()
    val st = Option(q.lastProgress).map(_.stateOperators.length).getOrElse(-1)
    val n = spark.sql("SELECT COUNT(*) FROM sim_pq_res").collect()(0).getLong(0)
    q.stop()
    assert(st == 0, s"expected stateless plan, got $st stateful operators")
    assert(n == 15, s"expected 3 queries x k=5 rows, got $n")
  }

  test("append ≡ rebuild: members AND codes identical, cell for cell") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val split = 60L
    val base = emb.where(col("vec_id") < split)
    val (packedBase, _, _) =
      SimStream.residualPqIndex(base, NCells, M, Ksub, Dim)
    val scbC = Similarity.residualScb(base,
      Similarity.ivfCells(base, NCells), NCells, M, Ksub, Dim)
    val appended = SimStream.residualPqIndexAppend(packedBase,
      Similarity.ivfAssign(emb.where(col("vec_id") >= split),
        Similarity.ivfCents(base, NCells)),
      scbC, M, Dim)
    val (rebuilt, _, _) = SimStream.residualPqIndex(emb, NCells, M, Ksub,
      Dim)
    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getSeq[Int](1).toList)).toList).toMap
    assert(cells(appended) == cells(rebuilt),
      "appended packed index must equal a from-scratch rebuild")
  }
}
