package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not a test): bounds the interpreted-lambda cost of the PQ
  * encode (`pqCodes` is a transform∘aggregate nest — CodegenFallback,
  * m × ksub × 3 fixed-point dots of dim/m terms per row) at
  * production-ish scale: the sf0.1 embeddings replicated, m=8, ksub ∈
  * {16, 64, 256} — against a plain scan of the same frame. The encode is
  * an index-build cost (paid per corpus vector per retrain), exactly the
  * profile that justified the native [[graft.expr.IvfBestCell]] kernel.
  * Run: `sbt "Test/runMain graft.pipeline.PqTaxProbe"`.
  */
object PqTaxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 64; val m = 8
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.1", "embeddings")
    val copies = 100 // 2000 rows -> 200k vectors
    val big = emb.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(copies - 1))).as("c"))
      .select((col("vec_id") * copies + col("c")).as("vec_id"),
        col("embedding"))
      .repartition(8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = big.count()
    println(s"[probe] corpus = $n vectors")
    val mvec = n / 1e6

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9 / mvec
      println(f"[probe] $label%-28s ${s}%.2f s/Mvec")
      s
    }
    val scan = time("plain scan")(
      big.agg(sum(size(col("embedding")))).collect())
    for (ksub <- Seq(16, 64, 256)) {
      val cbsRow = Similarity.pqPacked(
        Similarity.pqCodebooks(emb, m, ksub, dim))
      val assigned = big.withColumn("cell", lit(0L))
      val s = time(s"pqEncode ksub=$ksub")(
        Similarity.pqEncode(assigned, cbsRow, m, dim)
          .agg(sum(element_at(col("codes"), 1))).collect())
      println(f"[probe]   encode tax = ${s - scan}%.2f s/Mvec " +
        f"(${(s - scan) * 1000 / ksub}%.1f ms/Mvec/entry)")
      // the interpreted HOF nest the kernel replaced, same plan shape
      val h = time(s"HOF nest  ksub=$ksub")(
        assigned.crossJoin(broadcast(cbsRow))
          .select(Similarity.pqCodes(col("embedding"), col("cbs"), m,
            dim / m).as("codes"))
          .agg(sum(element_at(col("codes"), 1))).collect())
      println(f"[probe]   HOF tax = ${h - scan}%.2f s/Mvec " +
        f"(native is ${(h - scan) / (s - scan)}%.1fx faster)")
    }
    big.unpersist()
    spark.stop()
  }
}
