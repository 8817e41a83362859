package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not a test): recall@5 and cell-balance of the trained IVF
  * quantizer across Lloyd iteration counts, to adjudicate whether
  * training helps on the driver corpus — run with
  * `sbt "Test/runMain graft.pipeline.TrainedRecallProbe"`.
  */
object TrainedRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val nQ = 20
    val queries = emb.where(col("vec_id") < nQ)
    val K = 5

    def neighbors(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
    val exact = neighbors(Similarity.bruteTopK(emb, queries, K))
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = neighbors(df)
      val per = exact.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      per.sum / per.size
    }

    // untrained (first-N seed, no Lloyd)
    val r0 = recall(Similarity.ivfTopK(emb, queries, 8, 64, K))
    println(f"[probe] untrained seed  recall@$K = $r0%.3f")

    for (t <- Seq(1, 2, 3, 4, 6)) {
      val r = recall(Similarity.ivfTrainedTopK(emb, queries, 8, 64, K, t))
      // cell-size distribution after t Lloyd rounds
      val c0 = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
          graft.pipeline.VectorOps.norm(col("embedding")).as("cnrm"))
      // replicate the trainer's centroid fold to inspect balance
      def update(assigned: org.apache.spark.sql.DataFrame) = {
        val sums = assigned
          .select(col("cell"), posexplode(col("embedding")).as(Seq("i", "v")))
          .groupBy("cell", "i")
          .agg(sum(round(col("v").cast("double") * 1e7).cast("long")).as("s"),
            count(lit(1)).as("n"))
        sums.groupBy(col("cell").as("cid"))
          .agg(expr("transform(array_sort(collect_list(struct(i, s, n))), " +
            "x -> CAST(x.s AS DOUBLE)/1e7/x.n)").as("cvec"))
          .withColumn("cnrm", graft.pipeline.VectorOps.norm(col("cvec")))
      }
      val cT = (1 to t).foldLeft(c0)((c, _) => update(Similarity.ivfAssign(emb, c)))
      val sizes = Similarity.ivfAssign(emb, cT).groupBy("cell").count()
        .collect().map(_.getLong(1)).sorted
      val n = sizes.sum.toDouble
      val scanned = sizes.map(s => s * s).sum / n // E[cell size of a random vector]
      println(f"[probe] iters=$t%d recall@$K = $r%.3f  cells=${sizes.length}" +
        f"  sizes=${sizes.mkString("/")}  E[scanned]=$scanned%.0f")
      graft.core.Caches.releaseTransient(spark)
    }
    // untrained balance for comparison
    val sizes0 = Similarity.ivfCells(emb, 8).groupBy("cell").count()
      .collect().map(_.getLong(1)).sorted
    val n0 = sizes0.sum.toDouble
    println(f"[probe] untrained sizes=${sizes0.mkString("/")}  " +
      f"E[scanned]=${sizes0.map(s => s * s).sum / n0}%.0f")
    spark.stop()
  }
}
