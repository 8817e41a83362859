package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** ADC PQ scoring must be BIT-IDENTICAL to the composed reconstruction
  * kernel it replaced: `Σ_j lut[j][codes[j]]` over the PqAdcLut dot table
  * (and the norm table) equals the O(dim) fixed-point dot against the
  * materialized reconstruction because long partial sums re-associate
  * exactly. Pinned row-for-row on the corpus — every (query, candidate)
  * pair, not just top-k survivors — and on adversarial vectors (the
  * all-zero query and an all-zero codebook seed vector, which must
  * produce the same NaN cosines through both kernels).
  */
class PqAdcSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"
  private val NCells = 8
  private val M = 8
  private val Ksub = 16
  private val Dim = 64

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** every (query, candidate) ADC vs recon cosine over a corpus frame */
  private def compare(emb: org.apache.spark.sql.DataFrame): Long = {
    val cbsRow = Similarity.pqPacked(Similarity.pqCodebooks(emb, M, Ksub, Dim))
    val idx = Similarity.pqEncode(Similarity.ivfCells(emb, NCells),
      cbsRow, M, Dim)
    val queries = emb.select(col("vec_id").as("q_id"),
        col("embedding").as("qvec"))
      .withColumn("qnrm", VectorOps.norm(col("qvec")))
    val adcq = Similarity.withAdcTables(queries, cbsRow, M, Dim, "qvec")
    val pairs = idx.crossJoin(broadcast(adcq))
      .crossJoin(broadcast(cbsRow))
      .select(col("q_id"), col("vec_id"),
        Similarity.adcCosine(col("codes"), col("adc"), col("lutn"),
          col("qnrm")).as("adc_cos"),
        Similarity.reconCosine(col("codes"), col("cbs"), col("qvec"),
          col("qnrm"), M).as("recon_cos"))
    val n = pairs.count()
    // bit-level equality: NaN == NaN (and -0.0 vs 0.0 distinguished) via
    // the raw long bits — cast(double as binary) is rejected by Spark
    // analysis, so lift through doubleToRawLongBits instead
    val bits = udf((d: Double) => java.lang.Double.doubleToRawLongBits(d))
    val diff = pairs.where(bits(col("adc_cos")) =!= bits(col("recon_cos")))
      .count()
    assert(diff == 0, s"$diff of $n (query, candidate) pairs diverge")
    n
  }

  test("ADC ≡ recon scoring on every (query, candidate) pair of the corpus") {
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val n = compare(emb)
    assert(n > 100000L, s"expected a full cross product, got $n pairs")
  }

  test("zero-norm queries and zero codebook entries agree through NaN") {
    val s = spark
    import s.implicits._
    val emb = graft.core.Tables(spark, dir, "embeddings")
    // vec_id 0 seeds both a centroid and a codebook entry; zeroing it
    // plants zero vectors in the codebooks, and the extra all-zero query
    // row exercises qnrm = 0 — both must NaN identically in both kernels
    val zeroed = emb.withColumn("embedding",
      when(col("vec_id") === 0L,
        array_repeat(lit(0f), Dim)).otherwise(col("embedding")))
    compare(zeroed)
  }
}
