package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main: times one pipeline query cold + steady with the
  * bench's cache hygiene (blocking transient release between runs).
  * `runMain graft.Prof [sfDir] [query ...]`
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("dedup_ngram", "dedup_minhash")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // direct subtree probes not in the gate surface
    val extra: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "simhash_fp" -> ((s, d) =>
        graft.pipeline.Dedup.simhash(graft.core.Tables(s, d, "documents"))),
      "docs_len" -> ((s, d) =>
        graft.core.Tables(s, d, "documents")
          .agg(org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.length(
              org.apache.spark.sql.functions.col("text"))))))
    for (name <- names) {
      val q = extra.getOrElse(name, SparkEntry.queries(name))
      if (sys.env.contains("PROF_EXPLAIN"))
        q(spark, sfDir).explain("formatted")
      for (i <- 0 until 3) {
        graft.core.Caches.releaseTransient(spark, blocking = true)
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets Catalyst prune a projected
        // probe subtree to nothing and the "timing" measures a bare scan
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $name run$i: $dt%.2fs")
      }
    }
    spark.stop()
  }
}
