package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: explain + stage-isolate the 1M-vector assignment to find
  * what actually scales with nCells (AssignTaxProbe showed the native
  * kernel changed nothing — the argmax is not the bottleneck).
  */
object AssignPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.1", "embeddings")
    val copies = 100 // 200k vectors - enough to see the scaling
    val big = emb.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(copies - 1))).as("c"))
      .select((col("vec_id") * copies + col("c")).as("vec_id"),
        col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] corpus = ${big.count()} vectors")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val nCells = 64
    val cents = emb.where(col("vec_id") < nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
        VectorOps.norm(col("embedding")).as("cnrm"))
    val assigned = Similarity.ivfAssign(big, cents)
    assigned.explain("formatted")
    time("full ivfAssign")(assigned.agg(sum("cell")).collect())

    // isolate: kernel over a LITERAL packed-cents array (no crossJoin)
    val centsRow = Similarity.centsPacked(cents).collect()(0)
    val centsLit = {
      // rebuild the packed array as a literal column
      val rows = centsRow.getSeq[org.apache.spark.sql.Row](0)
      array(rows.map { r =>
        struct(lit(r.getLong(0)).as("cid"),
          array(r.getSeq[Any](1).map {
            case f: Float => lit(f); case d: Double => lit(d)
          }: _*).as("cvec"),
          lit(r.getDouble(2)).as("cnrm"))
      }: _*)
    }
    val direct = big.select(col("vec_id"),
      graft.expr.IvfBestCell(col("embedding"),
        VectorOps.norm(col("embedding")), centsLit, VectorOps.Scale).as("cell"))
    time("kernel w/ literal cents (warm)")(direct.agg(sum("cell")).collect())
    time("kernel w/ literal cents")(direct.agg(sum("cell")).collect())

    // isolate: crossJoin + trivial function of the cents column
    val trivial = big.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(Similarity.centsPacked(cents)))
      .select(size(col("cents")).as("cell"))
    time("crossJoin + size(cents) (warm)")(trivial.agg(sum("cell")).collect())
    time("crossJoin + size(cents)")(trivial.agg(sum("cell")).collect())
    spark.stop()
  }
}
