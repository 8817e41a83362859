package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for local iteration — not part of the library surface.
  * Currently: drives the README's Graft facade sample verbatim, plus a
  * duplicate-leaf query to observe the compiler CSE.
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // README sample, with a deterministic now inside the data range
    val df = Graft.query(spark, "/root/testdata/sf0.01",
      "SELECT avg('purchase'.'3' BUCKET 'testdata', 1 h) LAST 7 d",
      nowMs = 1704499200000L)
    df.show(3, false)
    println("[dev] facade rows=" + df.count())
    // wall-clock default `now` path (non-deterministic arg default)
    val live = Graft.query(spark, "/root/testdata/sf0.01",
      "SELECT avg('purchase'.'3' BUCKET 'testdata', 1 h) LAST 1 d")
    println("[dev] live-now rows=" + live.count() + " (expected 0: data is historical)")
    // duplicate leaves → CSE'd scan
    val dup = Graft.query(spark, "/root/testdata/sf0.01",
      "SELECT avg('purchase'.'3' BUCKET 'testdata', 1 d), " +
        "max('purchase'.'3' BUCKET 'testdata', 1 d) LAST 31 d",
      nowMs = 1706745600000L)
    println("[dev] dup-leaf rows=" + dup.count())
    spark.stop()
  }
}
