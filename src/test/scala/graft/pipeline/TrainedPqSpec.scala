package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The Lloyd-trained PQ codebooks, adjudicated the way the trained coarse
  * quantizer (TrainedIvfSpec) and residual coding (ResidualPqSpec) were:
  * the claim "training improves the codebook" is MEASURED on the
  * deterministic clustered corpus where coding quality is falsifiable
  * (the driver corpus is structureless — training there pins noise), and
  * the measured values become regression floors. Plus code-domain bounds
  * and the trained-equals-seed degenerate case on the real corpus.
  */
class TrainedPqSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---- clustered corpus (TrainedIvfSpec's generator, GOOD seeds) ----
  private val CDim = 8
  private val NCells = 4
  private val N = 124

  private def h(i: Int, d: Int): Double = {
    val x = (i * 1103515245L + d * 12345L + 6789L) & 0x7fffffffL
    (x % 1000) / 1000.0 - 0.5
  }

  private def clustered: DataFrame = {
    val s = spark
    import s.implicits._
    val rows = (0 until N).map { i =>
      val v = new Array[Float](CDim)
      if (i < NCells) v(2 * i) = 1.0f
      else {
        val c = i % NCells
        var d = 0
        while (d < CDim) {
          v(d) = ((if (d == 2 * c) 1.0 else 0.0) + 0.7 * h(i, d)).toFloat
          d += 1
        }
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("Lloyd training lifts shortlist quality over the seed codebook") {
    val emb = clustered.persist()
    val queries = emb.where(col("vec_id") >= NCells && col("vec_id") < 64)
    val k = 5; val m = 2; val ksub = 8
    val exact = pairs(Similarity.ivfTopK(emb, queries, NCells, CDim, k))
    def overlap(df: DataFrame): Double =
      pairs(df).intersect(exact).size.toDouble / exact.size
    val seed = overlap(Similarity.ivfPqTopK(emb, queries, NCells, m, ksub,
      CDim, k))
    val t1 = overlap(Similarity.ivfPqTrainedTopK(emb, queries, NCells, m,
      ksub, CDim, k, iters = 1))
    val t2 = overlap(Similarity.ivfPqTrainedTopK(emb, queries, NCells, m,
      ksub, CDim, k, iters = 2))
    info(f"shortlist overlap vs exact-in-cell@$k: seed=$seed%.3f " +
      f"iters1=$t1%.3f iters2=$t2%.3f")
    // measured on this corpus: seed 0.423 → iters1 0.477 → iters2 0.480;
    // floors pinned under the measured values as regression guards
    assert(t1 >= seed,
      f"one training round must not lose to the seed: $t1%.3f vs $seed%.3f")
    assert(t2 >= seed + 0.03,
      f"training must improve the clustered-corpus codebook decisively: " +
        f"$t2%.3f vs seed $seed%.3f")
    assert(t2 >= 0.46, f"trained overlap $t2%.3f below the measured floor")
    emb.unpersist()
  }

  test("trained codes stay in domain on the real corpus") {
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.001",
      "embeddings")
    val m = 8; val ksub = 16; val dim = 64
    val cbs = Similarity.pqCodebooksTrained(emb, m, ksub, dim, iters = 1)
    val rows = cbs.collect()
    assert(rows.length == m * ksub, "every (j, code) entry must survive")
    assert(rows.forall(r => r.getSeq[Double](2).length == dim / m))
  }
}
