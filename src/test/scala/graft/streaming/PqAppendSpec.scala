package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.Similarity

/** Incremental maintenance of the PRODUCT-QUANTIZED index: code words
  * depend on nothing but the vector and the frozen codebook row, so
  * encoding a refresh batch in isolation produces bit-identical codes to
  * a full re-encode — [[SimStream.pqIndexAppend]] over frozen centroids
  * and codebooks must equal [[SimStream.pqIndex]] over the unioned
  * corpus (members AND codes), and searches over either index must agree
  * exactly. (The base corpus here contains the first-ksub seed vectors,
  * so the full rebuild derives the SAME codebooks — the frozen-artifact
  * setup this append contract assumes.)
  */
class PqAppendSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"
  private val NCells = 8
  private val M = 8
  private val Ksub = 16
  private val Dim = 64
  private val Split = 60L

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("pqIndexAppend ≡ re-encoding the unioned corpus (members AND codes)") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val base = emb.where(col("vec_id") < Split)
    val cents = Similarity.ivfCents(base, NCells)
    val (packedBase, _, cbs) = SimStream.pqIndex(base, NCells, M, Ksub, Dim)
    val appended = SimStream.pqIndexAppend(packedBase,
      Similarity.ivfAssign(emb.where(col("vec_id") >= Split), cents),
      cbs, M, Dim)
    val (packedFull, _, _) = SimStream.pqIndex(emb, NCells, M, Ksub, Dim)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("cell"),
        expr("transform(cands, c -> struct(c.vec_id, c.codes))").as("cands"))
      .collect().map(r => (r.getLong(0), r.getSeq[Any](1).toList)).toMap
    val a = rows(appended)
    val f = rows(packedFull)
    assert(a.nonEmpty && a == f,
      s"appended cells=${a.keySet} full cells=${f.keySet}")
  }

  test("PQ search over the appended index ≡ over the rebuilt index") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val base = emb.where(col("vec_id") < Split)
    val cents = Similarity.ivfCents(base, NCells)
    val centsRow = Similarity.centsPacked(cents)
    val (packedBase, _, cbs) = SimStream.pqIndex(base, NCells, M, Ksub, Dim)
    val appended = SimStream.pqIndexAppend(packedBase,
      Similarity.ivfAssign(emb.where(col("vec_id") >= Split), cents),
      cbs, M, Dim)
    val (packedFull, _, _) = SimStream.pqIndex(emb, NCells, M, Ksub, Dim)
    val queries = emb.where(col("vec_id") < 20).select("vec_id", "embedding")
    def rows(packed: org.apache.spark.sql.DataFrame) =
      SimStream.topKAgainstPqIndex(queries, packed, centsRow, cbs,
        k = 5, m = M, dim = Dim)
        .select("query_id", "vec_id", "cos", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    val a = rows(appended)
    val f = rows(packedFull)
    assert(a.nonEmpty && a == f, {
      val d1 = (a -- f).take(3); val d2 = (f -- a).take(3)
      s"appended-only=$d1 rebuilt-only=$d2"
    })
  }
}
