package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugDecon {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $n: ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    graft.core.Tables(spark, dir, "documents").count()
    val staged = "/tmp/graft-stream-docs-" + Integer.toHexString(dir.hashCode)
    val sch = spark.read.parquet(s"$staged/documents.parquet").schema
    def stream() = spark.readStream.schema(sch).parquet(staged)
      .withColumn("ts", timestamp_millis((col("doc_id") + 86400L) * 1000L))
    def drain(n: String, out: org.apache.spark.sql.DataFrame): Unit = t(n) {
      val q = out.writeStream.format("memory").queryName(n)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    def shingled(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("w", split(trim(col("text")), " "))
      .where(size(col("w")) >= 3)
      .withColumn("sh", expr("transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
    for (i <- 0 until 2) {
      drain(s"sh_only$i", shingled(stream()).select(col("doc_id"), size(col("sh")).as("n")))
      val evalSh = graft.pipeline.Dedup.shingles3(
        graft.core.Tables(spark, dir, "documents").where(col("doc_id") % 97 === 0))
        .select("shingle").distinct().collect().map(_.getString(0)).toSet
      val b = spark.sparkContext.broadcast(evalSh)
      val overlap = udf((sh: Seq[String]) => sh.distinct.count(b.value.contains).toLong)
      drain(s"sh_udf$i", shingled(stream())
        .withColumn("n_overlap", overlap(col("sh")))
        .where(col("n_overlap") >= 3).select("doc_id", "n_overlap"))
      // distinct-array native alternative
      drain(s"sh_dist$i", shingled(stream())
        .select(col("doc_id"), size(array_distinct(col("sh"))).as("n")))
    }
    spark.stop()
  }
}
