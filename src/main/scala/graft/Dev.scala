package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for local iteration — not part of the library surface.
  * Currently: dumps the physical plan of the embedding near-dup query to
  * confirm FixedPointDot sits inside WholeStageCodegen.
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val df = graft.pipeline.Dedup.embedNearDup(emb, 6, 64, 0.3)
    df.explain("formatted")
    println("[dev] rows=" + df.count())
    spark.stop()
  }
}
