package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling scratch — not part of the library surface. Edit the
  * body to time whatever is under investigation; keep measurements honest
  * by mirroring the driver flow (cold first action = the Verify shape,
  * post-warmup = the Bench shape). Session-cold numbers are dominated by
  * per-plan codegen/JIT at test scale — profile both.
  *
  * Current investigation: sf1 scale rehearsal (VERDICT r4 #4) — a 10×
  * corpus (50k docs) synthesized from the sf0.1 documents table by
  * interleaving a copy-specific token every 3rd word (cross-copy bigram
  * Jaccard collapses, intra-copy near-dup structure is preserved), then:
  * block-occupancy stats for simhash combination blocking and ngram band
  * keys, and timed dedup-family runs against the 5 s envelope.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/tmp/sf1_rehearsal"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
      r
    }
    def release(): Unit =
      graft.core.Caches.releaseTransient(spark, blocking = true)

    // ---- synthesize the 10× corpus (written once, reused) ----
    val docs01 = graft.core.Tables(spark, sfDir, "documents")
    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      val copies = (0 until 10).map { k =>
        if (k == 0) docs01
        else docs01
          .withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
          .withColumn("text", expr(
            s"""concat_ws(' ', flatten(transform(
               |  split(trim(text), ' '),
               |  (w, i) -> CASE WHEN i % 3 = 2 THEN array(w, 'rk$k')
               |            ELSE array(w) END)))""".stripMargin))
      }
      copies.reduce(_ unionByName _).repartition(8)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    val docs = spark.read.parquet(s"$out/documents.parquet")
    println(s"[scratch] sf1 corpus docs=${docs.count()}")

    // ---- block occupancy: the n/2^32 uniformity claim ----
    def occupancy(name: String, blocks: org.apache.spark.sql.DataFrame,
                  keyCols: Seq[String]): Unit = {
      val sizes = blocks.groupBy(keyCols.map(col): _*).count()
      val row = sizes.agg(
        count(lit(1)).as("buckets"), max("count").as("max_occ"),
        avg("count").as("mean_occ"),
        sum((col("count") * (col("count") - 1) / 2).cast("long"))
          .as("cand_pairs")).collect()(0)
      println(f"[scratch] occupancy $name: buckets=${row.getLong(0)} " +
        f"max=${row.getLong(1)} mean=${row.getDouble(2)}%.3f " +
        f"pairs=${row.getLong(3)}")
      release()
    }
    occupancy("simhash-blocks sf0.1-baseline",
      graft.pipeline.Dedup.simhashBlocksForProfile(docs01),
      Seq("band_idx", "bv"))
    occupancy("ngram-bands sf0.1-baseline",
      graft.pipeline.Dedup.ngramMeltedForProfile(docs01),
      Seq("band_idx", "bh"))
    occupancy("simhash-combination-blocks",
      graft.pipeline.Dedup.simhashBlocksForProfile(docs),
      Seq("band_idx", "bv"))
    occupancy("ngram-band-keys",
      graft.pipeline.Dedup.ngramMeltedForProfile(docs),
      Seq("band_idx", "bh"))

    // ---- timed dedup family at sf1 (2 runs: first + steady) ----
    for (run <- 1 to 2) {
      release()
      t(s"run$run simhashPairs sf1")(
        graft.pipeline.Dedup.simhashPairs(docs, 8).orderBy("doc_a", "doc_b")
          .write.format("noop").mode("overwrite").save())
      release()
      t(s"run$run ngramJaccardPairs sf1")(
        graft.pipeline.Dedup.ngramJaccardPairs(docs, 0.3)
          .orderBy("doc_a", "doc_b")
          .write.format("noop").mode("overwrite").save())
      release()
      t(s"run$run minhashPairs sf1")(
        graft.pipeline.Dedup.minhashPairs(docs, 0.5).orderBy("doc_a", "doc_b")
          .write.format("noop").mode("overwrite").save())
      release()
      t(s"run$run exact sf1")(
        graft.pipeline.Dedup.exact(docs)
          .write.format("noop").mode("overwrite").save())
      release()
    }
    spark.stop()
  }
}
