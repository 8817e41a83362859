package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The Lloyd-trained residual codebooks (full IVFADC training),
  * adjudicated like TrainedPqSpec / ResidualPqSpec: the training win is
  * MEASURED on the deterministic clustered corpus where coding quality
  * is falsifiable, and the measured values become regression floors.
  */
class TrainedResidualSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---- clustered corpus (TrainedPqSpec's generator) ----
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

  test("training the residual codebook lifts shortlist quality over the seed") {
    val emb = clustered.persist()
    val queries = emb.where(col("vec_id") >= NCells && col("vec_id") < 64)
    val k = 5; val m = 2; val ksub = 8
    val exact = pairs(Similarity.ivfTopK(emb, queries, NCells, CDim, k))
    def overlap(df: DataFrame): Double =
      pairs(df).intersect(exact).size.toDouble / exact.size
    val seed = overlap(Similarity.ivfPqResidualTopKProbed(emb, queries,
      NCells, m, ksub, CDim, k, nProbe = 1))
    val t1 = overlap(Similarity.ivfPqResidualTrainedTopKProbed(emb,
      queries, NCells, m, ksub, CDim, k, nProbe = 1, iters = 1))
    val t2 = overlap(Similarity.ivfPqResidualTrainedTopKProbed(emb,
      queries, NCells, m, ksub, CDim, k, nProbe = 1, iters = 2))
    info(f"shortlist overlap vs exact-in-cell@$k: seed=$seed%.3f " +
      f"iters1=$t1%.3f iters2=$t2%.3f")
    // measured on this corpus: seed 0.610 → iters1 0.707 → iters2 0.733;
    // floors pinned under the measured values as regression guards
    assert(t1 >= seed,
      f"one training round must not lose to the seed: $t1%.3f vs $seed%.3f")
    assert(t2 >= seed + 0.08,
      f"training must improve the residual codebook decisively: " +
        f"$t2%.3f vs seed $seed%.3f")
    assert(t2 >= 0.70, f"trained overlap $t2%.3f below the measured floor")
    emb.unpersist()
  }

  test("trained-index append ≡ full re-encode against the frozen tables") {
    // the production refresh contract: deltas encode against the FROZEN
    // trained codebooks (retraining happens on the coarse-quantizer
    // cadence, not per batch), so append must equal re-encoding the
    // whole corpus against those same tables — member lists AND codes
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.001",
      "embeddings")
    val m = 8; val ksub = 16; val dim = 64; val nCells = 8
    val split = 400L
    val base = emb.where(col("vec_id") < split)
    val scbT = Similarity.residualScbTrained(base,
      Similarity.ivfCells(base, nCells), nCells, m, ksub, dim, iters = 1)
    val (packedBase, _, _) = graft.streaming.SimStream
      .residualPqIndexTrained(base, nCells, m, ksub, dim, iters = 1)
    val appended = graft.streaming.SimStream.residualPqIndexAppend(
      packedBase,
      Similarity.ivfAssign(emb.where(col("vec_id") >= split),
        Similarity.ivfCents(base, nCells)),
      scbT, m, dim)
    // centroids seed from the first nCells vectors (< split), so the
    // full-corpus cell assignment equals the frozen-quantizer one
    val rebuilt = Similarity.pqResidualEncode(
        Similarity.ivfCells(emb, nCells), scbT, m, dim)
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(
        struct(col("vec_id"), col("codes")))).as("cands"))
    def cellsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getSeq[Int](1).toList)).toList).toMap
    assert(cellsOf(appended) == cellsOf(rebuilt),
      "trained append must equal a frozen-table re-encode")
  }

  test("trained shifted tables keep full shape on the real corpus") {
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.001",
      "embeddings")
    val m = 8; val ksub = 16; val dim = 64; val nCells = 8
    val cells = Similarity.ivfCells(emb, nCells)
    val scbC = Similarity.residualScbTrained(emb, cells, nCells, m, ksub,
      dim, iters = 1)
    val rows = scbC.collect()
    assert(rows.length == nCells, "one shifted table per cell")
    rows.foreach { r =>
      val cbs = r.getAs[scala.collection.Seq[
        scala.collection.Seq[scala.collection.Seq[Double]]]](1)
      assert(cbs.length == m)
      cbs.foreach { cbj =>
        assert(cbj.length == ksub)
        cbj.foreach(e => assert(e.length == dim / m))
      }
    }
  }
}
