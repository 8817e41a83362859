package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.Similarity

/** Incremental maintenance of the QUANTIZED index: because each vector's
  * (lo, step) grid depends on nothing but the vector itself, quantizing a
  * refresh batch in isolation produces bit-identical codes to a full
  * repack — so [[SimStream.sq8IndexAppend]] over frozen centroids must
  * equal [[SimStream.sq8Index]] over the unioned corpus, members, codes
  * and all, and searches over either index must agree exactly.
  */
class Sq8AppendSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"
  private val NCells = 8
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

  test("sq8IndexAppend ≡ repacking the unioned corpus (members AND codes)") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val base = emb.where(col("vec_id") < Split)
    val cents = Similarity.ivfCents(base, NCells)
    val (packedBase, _) = SimStream.sq8Index(base, NCells)
    val appended = SimStream.sq8IndexAppend(packedBase,
      Similarity.ivfAssign(emb.where(col("vec_id") >= Split), cents))
    val (packedFull, _) = SimStream.sq8Index(emb, NCells)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("cell"),
        expr("transform(cands, c -> struct(c.vec_id, c.lo, c.step, c.code, c.dnrm))")
          .as("cands"))
      .collect().map(r => (r.getLong(0), r.getSeq[Any](1).toList)).toMap
    val a = rows(appended)
    val f = rows(packedFull)
    assert(a.nonEmpty && a == f,
      s"appended cells=${a.keySet} full cells=${f.keySet}")
  }

  test("quantized search over the appended index ≡ over the rebuilt index") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val base = emb.where(col("vec_id") < Split)
    val cents = Similarity.ivfCents(base, NCells)
    val centsRow = cents.agg(sort_array(collect_list(
      struct(col("cid"), col("cvec"), col("cnrm")))).as("cents"))
    val (packedBase, _) = SimStream.sq8Index(base, NCells)
    val appended = SimStream.sq8IndexAppend(packedBase,
      Similarity.ivfAssign(emb.where(col("vec_id") >= Split), cents))
    val (packedFull, _) = SimStream.sq8Index(emb, NCells)
    val queries = emb.where(col("vec_id").isin(10L, 25L, 70L))
      .select("vec_id", "embedding")
    def search(packed: org.apache.spark.sql.DataFrame) =
      SimStream.topKAgainstSq8Index(queries, packed, centsRow, k = 5)
        .select("query_id", "vec_id", "cos", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    val sa = search(appended)
    assert(sa.nonEmpty && sa == search(packedFull))
  }
}
