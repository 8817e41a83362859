package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (not a test): measures the row-local entropy fold (the
  * shipped [[TextOps.entropy]] — sorted-run boundaries + decimal fold,
  * zero shuffle) against the explode + (doc, word) shuffle alternative
  * it replaced, at production-ish scale — the sf0.1 documents replicated
  * to 2M docs. The row-local form trades interpreted
  * HOF lambdas for not moving every token through an exchange; this
  * probe records which side of that trade wins and by how much
  * (measured: 2.4–2.6× for row-local at 2M docs, single box — and the
  * explode form's exchange volume grows with the token count where the
  * row-local form moves nothing). Run:
  * `sbt "Test/runMain graft.pipeline.EntropyTaxProbe"`.
  */
object EntropyTaxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.1", "documents")
    val copies = 400 // sf0.1's 5000 docs -> 2M docs
    val big = docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(copies - 1))).as("c"))
      .select((col("doc_id") * copies + col("c")).as("doc_id"), col("text"))
      .repartition(8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = big.count()
    println(s"[probe] corpus = $n docs")

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label: $s%.2f s")
      s
    }
    time("scan (warm)")(big.agg(sum(length(col("text")))).collect())
    val scan = time("scan")(big.agg(sum(length(col("text")))).collect())

    // the explode + (doc, word) partial-agg shuffle + window alternative
    def explodeEntropy(d: DataFrame): DataFrame = {
      val wc = d
        .select(col("doc_id"), explode(
          filter(split(trim(col("text")), " "), x => x =!= "")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      wc.withColumn("p", col("c").cast("double") / col("n").cast("double"))
        .withColumn("t", round(col("p") * log(2.0, col("p")), 9))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_distinct"),
          (-graft.core.Exact.dsum(col("t"))).as("entropy"))
    }

    for (r <- 1 to 2) {
      val rl = time(s"row-local fold (run $r)")(
        TextOps.entropy(big).agg(sum("entropy")).collect())
      val ex = time(s"explode+shuffle (run $r)")(
        explodeEntropy(big).agg(sum("entropy")).collect())
      println(f"[probe]   row-local tax = ${rl - scan}%.2f s, " +
        f"explode tax = ${ex - scan}%.2f s, ratio = ${(ex - scan) / (rl - scan)}%.2fx")
    }
    spark.stop()
  }
}
