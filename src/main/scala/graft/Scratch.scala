package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling scratch — not part of the library surface. Edit the
  * body to time whatever is under investigation; keep measurements honest
  * by mirroring the driver flow (cold first action = the Verify shape,
  * post-warmup = the Bench shape). Session-cold numbers are dominated by
  * per-plan codegen/JIT at test scale — profile both.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables(spark, sfDir, "documents")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
      r
    }

    t("gate cold: simhashPairs+orderBy+write")(
      graft.pipeline.Dedup.simhashPairs(docs, 8).orderBy("doc_a", "doc_b")
        .coalesce(1).write.mode("overwrite").parquet("/tmp/scratch_sh"))
    // drop the first run's pinned intermediates — without this the re-run
    // cache-hits the materialized fingerprint table and "warm" measures a
    // cache scan, not the computation (codegen/JIT warm, data cold)
    graft.core.Caches.releaseTransient(spark)
    t("warm re-run (codegen warm, caches released)")(
      graft.pipeline.Dedup.simhashPairs(docs, 8).orderBy("doc_a", "doc_b")
        .coalesce(1).write.mode("overwrite").parquet("/tmp/scratch_sh"))
    spark.stop()
  }
}
