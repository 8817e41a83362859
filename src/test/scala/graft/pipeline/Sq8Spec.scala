package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Scalar-quantized IVF: the int8 index must be honestly small (byte
  * codes), honestly accurate (per-dimension error bounded by half a grid
  * step), and the rerank stage must make the approximation controllable —
  * with the shortlist covering the whole cell the output IS the exact IVF
  * search, and at rerank=3k the match rate against exact stays high.
  */
class Sq8Spec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def emb = graft.core.Tables(spark, dir, "embeddings")

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("query_id", "vec_id", "cos", "rank").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    .toSet

  test("codes are bytes — the 4x index-memory claim is in the schema") {
    val idx = Similarity.sq8Quantize(Similarity.ivfCells(emb, NCells))
    idx.schema("code").dataType match {
      case ArrayType(ByteType, _) => ()
      case other => fail(s"code column is $other, not array<byte>")
    }
    // and a code array is dim bytes long, not dim floats
    val n = idx.select(size(col("code"))).head().getInt(0)
    assert(n == Dim)
  }

  test("dequantized reconstruction is within half a grid step per dim") {
    val idx = Similarity.sq8Quantize(Similarity.ivfCells(emb, NCells))
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
    val dq = VectorOps.sq8Dequant(col("code"), col("lo"), col("step"))
    val worst = idx.select(
      max(aggregate(zip_with(dq, col("embedding"),
          (d, v) => abs(d - v.cast("double")) - col("step") * 0.5),
        lit(Double.MinValue), (acc, x) => greatest(acc, x))).as("w"))
      .head().getDouble(0)
    // tolerance for the double rounding in computing the grid position
    assert(worst <= 1e-9, s"reconstruction error exceeds step/2 by $worst")
  }

  test("rerank covering the whole cell reproduces exact ivfTopK") {
    val queries = emb.where(col("vec_id") < 40)
      .select("vec_id", "embedding")
    val maxCell = Similarity.ivfCells(emb, NCells)
      .groupBy("cell").count().agg(max("count")).head().getLong(0).toInt
    val sq8 = rows(Similarity.ivfSq8TopK(emb, queries, NCells, Dim,
      k = 5, rerank = maxCell))
    val exact = rows(Similarity.ivfTopK(emb, queries, NCells, Dim, k = 5))
    assert(sq8.nonEmpty && sq8 == exact, {
      val d1 = (sq8 -- exact).take(3); val d2 = (exact -- sq8).take(3)
      s"sq8-only=$d1 exact-only=$d2"
    })
  }

  test("rerank=3k match rate vs exact ivfTopK stays high") {
    val queries = emb.select("vec_id", "embedding")
    val sq8 = rows(Similarity.ivfSq8TopK(emb, queries, NCells, Dim,
      k = 5, rerank = 15))
    val exact = rows(Similarity.ivfTopK(emb, queries, NCells, Dim, k = 5))
    val rate = (sq8 intersect exact).size.toDouble / exact.size
    info(f"sq8 rerank=15 exact-row match rate: $rate%.4f")
    // measured 3-probe-free: quantization noise only reorders within the
    // shortlist, rerank restores exact cosines — the floor guards the
    // quantizer silently degrading (e.g. a broken rounding convention)
    assert(rate >= 0.97, f"match rate $rate%.4f dropped below 0.97")
  }
}
