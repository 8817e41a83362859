package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table under a scale-factor directory.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** embeddings.embedding element count (TESTDATA.md) — the ONE shared
    * constant every sim gate and oracle derives its dimension from
    * (r15 advisory: a literal 64 in one oracle family risked silent
    * drift against the gates' shared constant)
    */
  val EmbeddingDim: Int = 64

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
