package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Dev probe: dump the keep-first scrub physical plan lines touching the
  * gram hash, to pin where a gh-keyed sort could appear.
  */
object KeepFirstPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val p = Dedup.substringScrubKeepFirst(docs, 8)
      .queryExecution.executedPlan.toString()
    p.split("\n").filter(l => l.contains("Sort") || l.contains("Window") ||
      l.contains("Aggregate") || l.contains("Join") || l.contains("Exchange"))
      .foreach(l => println(l.trim.take(220)))
    spark.stop()
  }
}
