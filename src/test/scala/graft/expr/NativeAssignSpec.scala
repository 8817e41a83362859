package graft.expr

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.{Similarity, VectorOps}

/** Pins the native [[IvfBestCell]] assignment kernel to the
  * `bestCid(centScores(...))` HOF fold it replaced on the hot corpus
  * side — same discipline as SimhashFpSpec/MinShingleMd5Spec: the
  * composed form is the semantics contract (it is what the streaming
  * query side still runs and what the DuckDB oracle's window ranking
  * mirrors), so the kernel must agree row-for-row, including the edges:
  * zero-norm vectors (NaN cosine beats every real score; FIRST NaN —
  * smallest cid — wins), exact real-score ties (duplicate centroids →
  * smallest cid), float corpus against double trained centroids, and
  * the empty-centroid sentinel (-1 from both forms).
  */
class NativeAssignSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** both kernels over the same packed centroids; returns rows where the
    * native cell differs from the HOF cell (must be empty)
    */
  private def mismatches(emb: DataFrame, cents: DataFrame): Array[(Long, Long, Long)] =
    emb.select(col("vec_id"), col("embedding"),
        VectorOps.norm(col("embedding")).as("nrm"))
      .crossJoin(broadcast(Similarity.centsPacked(cents)))
      .select(col("vec_id"),
        IvfBestCell(col("embedding"), col("nrm"), col("cents"),
          VectorOps.Scale).as("native"),
        Similarity.bestCid(Similarity.centScores(
          col("embedding"), col("nrm"), col("cents"))).as("hof"))
      .where(col("native") =!= col("hof"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  private def asCents(df: DataFrame): DataFrame =
    df.select(col("vec_id").as("cid"), col("embedding").as("cvec"),
      VectorOps.norm(col("embedding")).as("cnrm"))

  test("native kernel matches the HOF fold on the corpus (float centroids)") {
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val bad = mismatches(emb, asCents(emb.where(col("vec_id") < 8)))
    assert(bad.isEmpty, s"native vs HOF drift: ${bad.take(5).mkString(", ")}")
  }

  test("native kernel matches the HOF fold against trained double centroids") {
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.01", "embeddings")
    // the Lloyd update emits array<double> centroids (per-dim exact means)
    val trained = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE) * 0.9)").as("cvec"))
      .withColumn("cnrm", VectorOps.norm(col("cvec")))
    val bad = mismatches(emb, trained)
    assert(bad.isEmpty, s"native vs HOF drift: ${bad.take(5).mkString(", ")}")
  }

  test("edges: zero vectors, duplicate centroids, empty centroid array") {
    val s = spark
    import s.implicits._
    val zero = Array.fill(4)(0f)
    val v = Array(1f, 0.5f, -0.25f, 0f)
    // doc 30 is a zero vector (every cosine NaN -> first cid wins);
    // centroids 1 and 2 are IDENTICAL (tie -> smaller cid); centroid 3
    // is zero-norm (NaN score for every vector -> beats the real scores)
    val emb = Seq(
      (30L, zero), (31L, v), (32L, v.map(_ * 2f)),
      (33L, Array(-1f, 2f, 0.125f, 3f))).toDF("vec_id", "embedding")
    val centsAll = Seq(
      (1L, v), (2L, v), (3L, zero)).toDF("vec_id", "embedding")
    val bad = mismatches(emb, asCents(centsAll))
    assert(bad.isEmpty, s"native vs HOF drift on edges: ${bad.mkString(", ")}")
    // NaN-beats-real pinned directly: every vector must land on the
    // zero-norm centroid's NaN score... except nothing real can beat it,
    // and cid 3 is LAST in the ordered array, so real scores won earlier
    // only if the fold wrongly preferred them — assert the actual cells
    val cells = Similarity.ivfAssign(emb, asCents(centsAll))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells == Map(30L -> 1L, 31L -> 3L, 32L -> 3L, 33L -> 3L),
      s"unexpected cells: $cells")
    // empty centroid table: both forms yield -1 pre-filter; ivfAssign
    // filters it to an empty frame (TrainedIvfSpec pins that)
    val bad2 = mismatches(emb, asCents(centsAll.where(lit(false))))
    assert(bad2.isEmpty, s"native vs HOF drift on empty cents: ${bad2.mkString(", ")}")
  }
}
