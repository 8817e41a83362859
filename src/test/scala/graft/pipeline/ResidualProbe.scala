package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (run manually, not a spec): raw-PQ vs residual-PQ shortlist
  * overlap across cluster-noise amplitudes — decides where the
  * ResidualPqSpec assertion is signal rather than noise.
  *
  * Run: sbt 'Test/runMain graft.pipeline.ResidualProbe'
  */
object ResidualProbe {
  private def h(i: Int, d: Int): Double = {
    val x = (i * 1103515245L + d * 12345L + 6789L) & 0x7fffffffL
    (x % 1000) / 1000.0 - 0.5
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val CDim = 8; val NCells = 4; val N = 124; val k = 5
    def corpus(noise: Double): DataFrame = {
      val rows = (0 until N).map { i =>
        val v = new Array[Float](CDim)
        if (i < NCells) v(2 * i) = 1.0f
        else {
          val c = i % NCells
          var d = 0
          while (d < CDim) {
            v(d) = ((if (d == 2 * c) 1.0 else 0.0) + noise * h(i, d)).toFloat
            d += 1
          }
        }
        (i.toLong, v)
      }
      rows.toDF("vec_id", "embedding")
    }
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (noise <- Seq(0.2, 0.3, 0.5, 0.7); m <- Seq(2, 4); ksub <- Seq(8, 16)) {
      val emb = corpus(noise).persist()
      val queries = emb.where(col("vec_id") >= NCells && col("vec_id") < 64)
      val exact = pairs(Similarity.ivfTopK(emb, queries, NCells, CDim, k))
      def overlap(df: DataFrame): Double =
        pairs(df).intersect(exact).size.toDouble / exact.size
      val raw = overlap(Similarity.ivfPqTopK(emb, queries, NCells, m, ksub,
        CDim, k))
      val res = overlap(Similarity.ivfPqResidualTopKProbed(emb, queries,
        NCells, m, ksub, CDim, k, nProbe = 1))
      println(f"[probe] noise=$noise m=$m ksub=$ksub raw=$raw%.3f residual=$res%.3f")
      emb.unpersist()
    }
    spark.stop()
  }
}
