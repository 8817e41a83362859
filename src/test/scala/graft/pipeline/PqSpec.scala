package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Product-quantization invariants for [[Similarity.ivfPqTopK]] and its
  * building blocks — the properties the DuckDB hash-gate can't see:
  * code-domain bounds, self-reconstruction of the seed vectors, recall
  * against the exact search, the degenerate-input guard, and the plan
  * shape (broadcast-only joins, no unblocked Cartesian product).
  */
class PqSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val Dim = 64

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb: DataFrame =
    graft.core.Tables(spark, "/root/testdata/sf0.01", "embeddings")

  private def encoded(m: Int, ksub: Int): DataFrame = {
    val cells = Similarity.ivfCells(emb, 8)
    val cbsRow = Similarity.pqPacked(Similarity.pqCodebooks(emb, m, ksub, Dim))
    Similarity.pqEncode(cells, cbsRow, m, Dim)
  }

  test("codes are m integers each inside the codebook domain") {
    val bad = encoded(m = 8, ksub = 16)
      .where(size(col("codes")) =!= 8 ||
        exists(col("codes"), c => c < 0 || c >= 16))
      .count()
    assert(bad === 0)
  }

  test("seed vectors reconstruct to themselves (their own subvectors are in the codebook)") {
    // vec_id < ksub: every subvector is a codebook entry at L2 distance 0,
    // so the argmin picks a zero-distance entry and the reconstruction is
    // bit-equal to the original embedding
    val m = 8; val ksub = 16
    val cbsRow = Similarity.pqPacked(Similarity.pqCodebooks(emb, m, ksub, Dim))
    val cells = Similarity.ivfCells(emb.where(col("vec_id") < ksub), 8)
    val enc = Similarity.pqEncode(cells, cbsRow, m, Dim)
    val recon = enc.crossJoin(broadcast(cbsRow))
      .select(col("vec_id"),
        flatten(transform(sequence(lit(0), lit(m - 1)), j =>
          element_at(element_at(col("cbs"), j + 1),
            element_at(col("codes"), j + 1) + 1))).as("recon"))
    val drift = recon.join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .where(col("recon") =!= col("embedding")).count()
    assert(drift === 0)
  }

  test("PQ ranking finds most of the exact in-cell top-k (recall sanity)") {
    val q = emb.where(col("vec_id").isin(10L, 11L, 12L))
    val exact = Similarity.ivfTopK(emb, q, nCells = 8, dim = Dim, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.ivfPqTopK(emb, q, nCells = 8, m = 8, ksub = 16,
      dim = Dim, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(exact).size.toDouble / exact.size
    info(f"PQ@5 vs exact-in-cell@5 overlap = $recall%.3f")
    // 16-entry codebooks over a near-uniform corpus are a coarse code;
    // the bound pins "the ranking is signal, not noise", not parity
    assert(recall >= 0.2, f"PQ overlap $recall%.3f collapsed")
  }

  test("rerank >= cell size reproduces the exact IVF search bit-for-bit") {
    // with the whole cell in the shortlist the exact rescore ranks every
    // candidate, so the PQ stage can only reorder, never exclude — the
    // same by-construction identity ivfSq8TopK claims (Sq8Spec)
    val q = emb.where(col("vec_id").isin(10L, 11L, 12L))
    def rows(df: DataFrame) = df
      .select("query_id", "vec_id", "cos", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val exact = rows(Similarity.ivfTopK(emb, q, nCells = 8, dim = Dim, k = 5))
    val pq = rows(Similarity.ivfPqRerankTopK(emb, q, nCells = 8, m = 8,
      ksub = 16, dim = Dim, k = 5, rerank = 500))
    assert(pq === exact)
  }

  test("empty corpus yields an empty encode, not a broken index") {
    val empty = emb.where(col("vec_id") < 0)
    val cbsRow = Similarity.pqPacked(Similarity.pqCodebooks(empty, 8, 16, Dim))
    val out = Similarity.pqEncode(
      Similarity.ivfAssign(empty, Similarity.ivfCents(empty, 8))
        .withColumn("cell", col("cell")), cbsRow, 8, Dim)
    assert(out.count() === 0)
  }

  test("plan: no unblocked Cartesian, index side joins by broadcast only") {
    val q = emb.where(col("vec_id").isin(10L, 11L, 12L))
    val plan = Similarity.ivfPqTopK(emb, q, nCells = 8, m = 8, ksub = 16,
      dim = Dim, k = 5).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "PQ search planned an unblocked Cartesian product")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "expected broadcast joins for codebooks/queries")
    assert(!plan.contains("SortMergeJoin"),
      "the encoded index must not shuffle for a broadcastable join")
  }
}
