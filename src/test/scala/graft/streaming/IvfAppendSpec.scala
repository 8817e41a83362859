package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.Similarity

/** Incremental IVF maintenance: assigning a refresh batch against the
  * index's FROZEN centroid table and folding it into the packed index
  * ([[Similarity.ivfAssign]] + [[SimStream.ivfIndexAppend]]) must be
  * bit-identical to rebuilding the whole index over the unioned corpus
  * with the same centroids — the property that makes an IVF index
  * append-only between coarse-quantizer retrains.
  */
class IvfAppendSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val NCells = 8

  test("ivfAssign on a delta ≡ the full rebuild's rows for those vectors") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val split = 60L // base holds the first-nCells centroid vectors (ids < 8)
    val base = emb.where(col("vec_id") < split)
    val delta = emb.where(col("vec_id") >= split)
    // centroids are the first nCells vectors by id — identical for base
    // and full corpus, which is what "frozen quantizer" means here
    val cents = Similarity.ivfCents(base, NCells)
    val appended = Similarity.ivfAssign(delta, cents)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuilt = Similarity.ivfCells(emb, NCells)
      .where(col("vec_id") >= split)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(appended.nonEmpty && appended == rebuilt)
  }

  test("ivfIndexAppend ≡ repacking the unioned corpus (cells and member order)") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val split = 60L
    val base = emb.where(col("vec_id") < split)
    val delta = emb.where(col("vec_id") >= split)
    val cents = Similarity.ivfCents(base, NCells)
    val (packedBase, _) = SimStream.ivfIndex(base, NCells)
    val appended = SimStream.ivfIndexAppend(packedBase,
      Similarity.ivfAssign(delta, cents))
    val (packedFull, _) = SimStream.ivfIndex(emb, NCells)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("cell"), expr("transform(cands, c -> c.vec_id)").as("ids"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
    val a = rows(appended)
    val f = rows(packedFull)
    assert(a == f, s"appended=${a.keySet} full=${f.keySet}")
  }

  test("search over the appended index ≡ search over the rebuilt index") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val split = 60L
    val cents = Similarity.ivfCents(emb.where(col("vec_id") < split), NCells)
    val centsRow = cents.agg(sort_array(collect_list(
      struct(col("cid"), col("cvec"), col("cnrm")))).as("cents"))
    val (packedBase, _) = SimStream.ivfIndex(
      emb.where(col("vec_id") < split), NCells)
    val appended = SimStream.ivfIndexAppend(packedBase,
      Similarity.ivfAssign(emb.where(col("vec_id") >= split), cents))
    val (packedFull, _) = SimStream.ivfIndex(emb, NCells)
    val queries = emb.where(col("vec_id").isin(10L, 25L, 70L))
      .select("vec_id", "embedding")
    def search(packed: org.apache.spark.sql.DataFrame) =
      SimStream.topKAgainstIvfIndex(queries, packed, centsRow, k = 5)
        .select("query_id", "vec_id", "cos", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    val sa = search(appended)
    assert(sa.nonEmpty && sa == search(packedFull))
  }
}
