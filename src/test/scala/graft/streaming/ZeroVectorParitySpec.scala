package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.Similarity

/** Zero-norm vectors make cosines NaN (0/0), and the batch window
  * (`ORDER BY cos DESC, vec_id`) places NaN FIRST (Spark treats NaN as
  * the largest double) while a plain negated `array_sort` key would
  * place it LAST — the stream kernels map NaN → −∞ in the sort key
  * (SimStream.descKey) and NaN-aware argmax so stream ≡ batch holds on
  * degenerate inputs too. The shipped testdata has no zero vectors, so
  * this spec poisons the corpus itself.
  */
class ZeroVectorParitySpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"
  private val NCells = 8
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

  /** corpus with vec_id 20 (a non-centroid member) zeroed out */
  private def poisoned = graft.core.Tables(spark, dir, "embeddings")
    .where(col("vec_id") < 60)
    .withColumn("embedding",
      when(col("vec_id") === 20L,
        array_repeat(lit(0.0f), Dim)).otherwise(col("embedding")))

  /** NaN-safe row canonicalization (NaN != NaN breaks set equality) */
  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("query_id", "vec_id", "cos", "rank").collect()
    .map { r =>
      val c = r.getDouble(2)
      (r.getLong(0), r.getLong(1), if (c.isNaN) "NaN" else c.toString,
        r.getInt(3))
    }.toSet

  test("zero corpus vector: all three stream kernels ≡ their batch twins") {
    val emb = poisoned
    // queries include the zero vector's cell-mates AND the zero vector
    val queries = emb.where(col("vec_id").isin(10L, 20L, 25L))
      .select("vec_id", "embedding")
    val (packed, cents) = SimStream.ivfIndex(emb, NCells)
    val (packedQ, _) = SimStream.sq8Index(emb, NCells)

    val sSingle = rows(SimStream.topKAgainstIvfIndex(
      queries, packed, cents, k = 5))
    val bSingle = rows(Similarity.ivfTopK(emb, queries, NCells, Dim, 5))
    assert(sSingle.nonEmpty && sSingle == bSingle, {
      s"single: stream-only=${(sSingle -- bSingle).take(3)} " +
        s"batch-only=${(bSingle -- sSingle).take(3)}"
    })

    val sProbed = rows(SimStream.topKAgainstIvfIndexProbed(
      queries, packed, cents, k = 5, nProbe = 3))
    val bProbed = rows(Similarity.ivfTopKProbed(
      emb, queries, NCells, Dim, 5, nProbe = 3))
    assert(sProbed == bProbed, {
      s"probed: stream-only=${(sProbed -- bProbed).take(3)} " +
        s"batch-only=${(bProbed -- sProbed).take(3)}"
    })

    val sSq8 = rows(SimStream.topKAgainstSq8Index(
      queries, packedQ, cents, k = 5))
    val bSq8 = rows(Similarity.ivfSq8QuantTopK(emb, queries, NCells, Dim, 5))
    assert(sSq8 == bSq8, {
      s"sq8: stream-only=${(sSq8 -- bSq8).take(3)} " +
        s"batch-only=${(bSq8 -- sSq8).take(3)}"
    })
  }

  test("all-cells IVF probe ≡ brute on the poisoned corpus — the DQL " +
    "dispatch identity survives NaN degenerates (topk and range)") {
    val emb = poisoned
    val queries = emb.where(col("vec_id").isin(10L, 20L, 25L))
      .select("vec_id", "embedding")
    val cells = Similarity.ivfCells(emb, NCells)
    val cents = Similarity.ivfCents(emb, NCells)
    val ivf = rows(Similarity.ivfTopKProbedOn(cells, cents, queries,
      k = 5, nProbe = NCells))
    val brute = rows(Similarity.bruteTopK(emb, queries, 5))
    assert(ivf.nonEmpty && ivf == brute, {
      s"topk: ivf-only=${(ivf -- brute).take(3)} " +
        s"brute-only=${(brute -- ivf).take(3)}"
    })
    def rangeRows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "vec_id", "cos").collect()
      .map { r =>
        val c = r.getDouble(2)
        (r.getLong(0), r.getLong(1), if (c.isNaN) "NaN" else c.toString)
      }.toSet
    val ivfR = rangeRows(Similarity.ivfRangeOn(cells, cents, queries,
      minCos = 0.3, nProbe = NCells))
    val bruteR = rangeRows(Similarity.rangeSearch(emb, queries, 0.3))
    // the NaN rows (zero corpus vector) must be PRESENT on both sides —
    // Spark orders NaN above any threshold
    assert(ivfR.exists(_._3 == "NaN") && ivfR == bruteR, {
      s"range: ivf-only=${(ivfR -- bruteR).take(3)} " +
        s"brute-only=${(bruteR -- ivfR).take(3)}"
    })
  }

  test("the zero vector ranks FIRST among its cell-mates' neighbors (NaN-first, the batch order)") {
    val emb = poisoned
    // a query sharing the zero vector's cell sees cos=NaN for it; the
    // batch window ranks NaN first — the stream must agree
    val zeroCell = Similarity.ivfCells(emb, NCells)
      .where(col("vec_id") === 20L).select("cell").head().getLong(0)
    val mate = Similarity.ivfCells(emb, NCells)
      .where(col("cell") === zeroCell && col("vec_id") =!= 20L)
      .select("vec_id").head().getLong(0)
    val queries = emb.where(col("vec_id") === mate)
      .select("vec_id", "embedding")
    val (packed, cents) = SimStream.ivfIndex(emb, NCells)
    val top = SimStream.topKAgainstIvfIndex(queries, packed, cents, k = 5)
      .where(col("rank") === 1).select("vec_id", "cos").head()
    assert(top.getLong(0) == 20L && top.getDouble(1).isNaN,
      s"expected the NaN-scored zero vector at rank 1, got $top")
  }
}
