package graft.expr

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.{Similarity, VectorOps}

/** Pins the native [[PqEncode]] kernel to the `pqCodes` HOF nest it
  * replaced on the index-build path — the NativeAssignSpec discipline:
  * the composed form is the semantics contract (its integer-space L2
  * argmin is what the DuckDB oracle's window ranking mirrors), so the
  * kernel must agree code-for-code, including the edges: zero vectors
  * (distance reduces to dotL(c,c) — ties on code), duplicate codebook
  * entries (exact-distance ties keep the smaller code), and seed
  * vectors (distance 0 to their own subvector).
  */
class NativePqEncodeSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  /** rows where the native code word differs from the HOF code word */
  private def mismatches(vecs: DataFrame, cbsRow: DataFrame, m: Int): Long =
    vecs.crossJoin(broadcast(cbsRow))
      .select(col("vec_id"),
        PqEncode(col("embedding"), col("cbs"), m, Dim / m,
          VectorOps.Scale).as("native"),
        Similarity.pqCodes(col("embedding"), col("cbs"), m,
          Dim / m).as("hof"))
      .where(col("native") =!= col("hof"))
      .count()

  test("native kernel matches the HOF nest on the corpus") {
    val cbsRow = Similarity.pqPacked(Similarity.pqCodebooks(emb, 8, 16, Dim))
    assert(mismatches(emb, cbsRow, 8) === 0)
  }

  test("zero vectors and duplicate codebook entries (tie-breaks)") {
    val s = spark
    import s.implicits._
    // codebook with entry 1 duplicating entry 0 in every subspace: ties
    // at identical distance must keep code 0 in both forms
    val seeds = Seq(
      (0L, Array.fill(Dim)(0.25f)),
      (1L, Array.fill(Dim)(0.25f)),
      (2L, Array.tabulate(Dim)(i => (i % 5 - 2) * 0.1f)),
      (3L, Array.fill(Dim)(0f))
    ).toDF("vec_id", "embedding")
    val vecs = Seq(
      (10L, Array.fill(Dim)(0f)),              // zero vector
      (11L, Array.fill(Dim)(0.25f)),           // exact duplicate of seeds
      (12L, Array.tabulate(Dim)(i => (i % 7 - 3) * 0.05f))
    ).toDF("vec_id", "embedding")
    val cbsRow = Similarity.pqPacked(Similarity.pqCodebooks(seeds, 8, 4, Dim))
    assert(mismatches(vecs, cbsRow, 8) === 0)
  }

  test("kernel stays inside whole-stage codegen (and the codegen path runs)") {
    // a literal codebook keeps the plan a pure narrow projection — if the
    // expression forced CodegenFallback the stage would drop out of
    // WholeStageCodegen (the production shape adds only the broadcast
    // codebook join around this projection)
    val cb: Seq[Seq[Seq[Float]]] = Seq.tabulate(8)(j =>
      Seq.tabulate(4)(c => Seq.tabulate(Dim / 8)(i =>
        0.05f * (c + 1) * (if ((i + j) % 2 == 0) 1 else -1))))
    val df = emb.select(PqEncode(col("embedding"), typedLit(cb), 8, Dim / 8,
      VectorOps.Scale).as("codes"))
    // `*(n)` is the whole-stage-codegen marker in the plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"PqEncode fell out of whole-stage codegen:\n$plan")
    // execute it, so the generated Java actually compiles and runs
    assert(df.where(size(col("codes")) === 8).count() === emb.count())
  }
}
