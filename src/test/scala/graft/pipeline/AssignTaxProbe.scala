package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not a test): bounds the interpreted-lambda cost of the
  * row-local IVF cell assignment (`centScores` + `bestCid` are Catalyst
  * HOFs, which are CodegenFallback) at production-ish scale — the sf0.1
  * embeddings replicated to 1M vectors, nCells ∈ {8, 64, 256} — against
  * a plain scan of the same frame. If the per-million-vector tax
  * dominates, the escape hatch is a native argmax expression (the
  * SimhashFp playbook). Run:
  * `sbt "Test/runMain graft.pipeline.AssignTaxProbe"`.
  */
object AssignTaxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.1", "embeddings")
    val copies = 500 // 2000 rows -> 1M vectors
    val big = emb.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(copies - 1))).as("c"))
      .select((col("vec_id") * copies + col("c")).as("vec_id"),
        col("embedding"))
      // the single source file would otherwise leave ONE partition and
      // serialize the whole probe onto one core (the first run of this
      // probe did exactly that — see NOTES_r10)
      .repartition(8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = big.count()
    println(s"[probe] corpus = $n vectors")

    def time[A](label: String)(f: => A): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label: $s%.2f s")
      s
    }
    // warm + baseline: one linear scan touching the embedding column
    time("scan (warm)")(big.agg(sum(element_at(col("embedding"), 1))).collect())
    val scan = time("scan")(
      big.agg(sum(element_at(col("embedding"), 1))).collect())
    for (nCells <- Seq(8, 64, 256)) {
      val cents = emb.where(col("vec_id") < nCells)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
          VectorOps.norm(col("embedding")).as("cnrm"))
      val s = time(s"ivfAssign nCells=$nCells")(
        Similarity.ivfAssign(big, cents).agg(sum("cell")).collect())
      println(f"[probe]   assignment tax = ${s - scan}%.2f s/Mvec " +
        f"(${(s - scan) * 1000 / nCells}%.1f ms/Mvec/centroid)")
      // the interpreted HOF fold the kernel replaced, same plan shape
      val h = time(s"HOF fold  nCells=$nCells")(
        big.select(col("vec_id"), col("embedding"),
            VectorOps.norm(col("embedding")).as("nrm"))
          .crossJoin(broadcast(Similarity.centsPacked(cents)))
          .select(Similarity.bestCid(Similarity.centScores(
            col("embedding"), col("nrm"), col("cents"))).as("cell"))
          .agg(sum("cell")).collect())
      println(f"[probe]   HOF tax = ${h - scan}%.2f s/Mvec " +
        f"(native is ${(h - scan) / (s - scan)}%.1fx faster)")
    }
    big.unpersist()
    spark.stop()
  }
}
