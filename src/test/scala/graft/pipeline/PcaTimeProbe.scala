package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Dev probe (run manually, not a spec): wall/job-latency A/B for the PCA
  * power-iteration ladder at bench scale — mirrors the Bench environment
  * (local[32], shuffle=32, noop sink, warmup absorbed) so before/after
  * numbers for the step-materialization refactor are comparable to the
  * BENCH_DETAIL contract column.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt 'Test/runMain graft.pipeline.PcaTimeProbe'
  */
object PcaTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[pca-probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // warmup: session + parquet footers + codegen baseline
    force(graft.SparkEntry.queries("tpch_q1")(spark, sfDir))
    for (run <- 1 to 2) {
      t(s"embed_pca run$run")(
        force(graft.SparkEntry.queries("embed_pca")(spark, sfDir)))
      t(s"embed_project run$run")(
        force(graft.SparkEntry.queries("embed_project")(spark, sfDir)))
    }
    spark.stop()
  }
}
