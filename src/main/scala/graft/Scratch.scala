package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** throwaway profiling scratch — not part of the library surface */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables(spark, sfDir, "documents")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
      r
    }

    // COLD, first action of the session — mirrors the Verify flow
    t("gate cold: simhashPairs+orderBy+write")(
      graft.pipeline.Dedup.simhashPairs(docs, 8).orderBy("doc_a", "doc_b")
        .coalesce(1).write.mode("overwrite").parquet("/tmp/scratch_sh"))
    t("docs.count")(docs.count())
    // simhash combination-blocking breakdown
    val fp = graft.pipeline.Dedup.simhash(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("fp materialize")(fp.count())
    val chunked = fp.selectExpr("doc_id", "fp_hi", "fp_lo",
      "(fp_hi >> 21) & 2047 AS c0", "(fp_hi >> 10) & 2047 AS c1",
      "fp_hi & 1023 AS c2", "(fp_lo >> 21) & 2047 AS c3",
      "(fp_lo >> 10) & 2047 AS c4", "fp_lo & 1023 AS c5")
    val combos = (0 until 6).combinations(3).map(_.toSeq).toSeq
    val stackArgs = combos.zipWithIndex
      .map { case (c, i) =>
        s"$i, ((c${c(0)} << 22) | (c${c(1)} << 11) | c${c(2)})" }
      .mkString(", ")
    val melted = chunked.selectExpr("doc_id", "fp_hi", "fp_lo",
      s"stack(${combos.length}, $stackArgs) as (band_idx, bv)")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("melted materialize")(melted.count())
    val joined = melted.as("x").join(melted.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.bv") === col("y.bv") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        (bit_count(col("x.fp_hi").bitwiseXOR(col("y.fp_hi"))) +
         bit_count(col("x.fp_lo").bitwiseXOR(col("y.fp_lo")))).as("hamming"))
    t("join raw count")(joined.count())
    t("join+filter+distinct")(joined.where(col("hamming") <= 8)
      .distinct().count())
    t("simhashPairs full")(graft.pipeline.Dedup.simhashPairs(docs, 8)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
