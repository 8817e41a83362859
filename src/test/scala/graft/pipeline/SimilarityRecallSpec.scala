package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Recall measurement for the approximate similarity operators against the
  * exact brute-force baseline on the real embeddings table. The hash
  * gates prove engine parity; THIS pins result QUALITY: an approximate
  * index that returns the wrong neighbors would still hash-match its own
  * mirror, so recall needs its own floor.
  *
  * The testdata embeddings are unclustered (near-uniform directions) —
  * the hardest case for space-partitioning indexes — so the floors below
  * are conservative lower bounds, printed alongside the measured values
  * for the record.
  */
class SimilarityRecallSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.01"
  private val Dim = 64
  private val K = 5
  private val NQueries = 20

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb = graft.core.Tables(spark, dir, "embeddings")
  private def queries = emb.where(col("vec_id") < NQueries)

  /** (query_id -> set of returned vec_ids) */
  private def neighbors(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("query_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }

  private def recallOf(approx: DataFrame, label: String): Double = {
    val exact = neighbors(Similarity.bruteTopK(emb, queries, K))
    val got = neighbors(approx)
    val perQuery = exact.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val r = perQuery.sum / perQuery.size
    info(f"$label recall@$K over $NQueries queries: $r%.3f")
    r
  }

  test("LSH top-k recall stays above the single-bucket floor") {
    val r = recallOf(
      Similarity.lshTopK(emb, queries, bits = 6, dim = Dim, k = K), "lsh")
    // 6 hyperplanes on UNIFORM data is the worst case: the true top-k
    // are barely angularly closer than the rest, so the same-bucket
    // probability approaches random. Measured 0.07 on this corpus
    // (random would be K/2000 ≈ 0.0025); the floor is a regression
    // guard just below the measured value, not a quality target —
    // clustered corpora (the production case) bucket far better.
    assert(r >= 0.03, f"lsh recall $r%.3f below floor")
  }

  test("multi-probe LSH beats single-bucket LSH") {
    val single = recallOf(
      Similarity.lshTopK(emb, queries, bits = 6, dim = Dim, k = K), "lsh")
    val multi = recallOf(
      Similarity.lshMultiProbeTopK(emb, queries, bits = 6, dim = Dim, k = K),
      "multiprobe")
    assert(multi >= single,
      f"probing neighbor buckets must not lose recall: $multi%.3f < $single%.3f")
    // measured 0.30 on the unclustered corpus (4.3x the single-bucket
    // recall) — floor pinned just below as a regression guard
    assert(multi >= 0.15, f"multiprobe recall $multi%.3f below floor")
  }

  test("IVF top-k recall stays above the nprobe floor") {
    val r = recallOf(
      Similarity.ivfTopK(emb, queries, nCells = 8, dim = Dim, k = K), "ivf")
    // measured 0.51 / 0.48 on the unclustered corpus — floors pinned
    // just below as regression guards
    assert(r >= 0.3, f"ivf recall $r%.3f below floor")
    val rt = recallOf(
      Similarity.ivfTrainedTopK(emb, queries, nCells = 8, dim = Dim, k = K),
      "ivf-trained")
    assert(rt >= 0.3, f"trained-ivf recall $rt%.3f below floor")
  }
}
