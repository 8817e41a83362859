package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for local iteration — not part of the library surface.
  * Currently: emulates the driver's smoke check (entry() on a fresh session
  * with no special confs, rows > 0).
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[dev] entry() rows=$n")
    df.show(5, false)
    spark.stop()
  }
}
