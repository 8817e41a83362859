package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling scratch — not part of the library surface. Edit the
  * body to time whatever is under investigation; keep measurements honest
  * by mirroring the driver flow (cold first action = the Verify shape,
  * post-warmup = the Bench shape). Session-cold numbers are dominated by
  * per-plan codegen/JIT at test scale — profile both.
  *
  * Current investigation: sf1 scale rehearsal for the STREAMING document
  * operators (round 7): a 10× corpus (50k docs, synthesized from the
  * sf0.1 documents table by interleaving a copy-specific token every 3rd
  * word — cross-copy bigram Jaccard collapses, intra-copy near-dup
  * structure is preserved), then: band-index build at sf1, and timed
  * streaming replays of near-dup-vs-index, decontamination, and exact
  * dedup over the full 10× corpus through the file source.
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

    // ---- band index at sf1: build + persist (the materialized artifact) ----
    val index = t("bandIndex build+persist sf1") {
      val ix = graft.pipeline.Dedup.bandIndex(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ix.count()
      ix
    }

    // ---- streaming replays over the full 10× corpus (file source) ----
    val sch = docs.schema
    def stream() = spark.readStream.schema(sch)
      .parquet(s"$out/documents.parquet")
      .withColumn("ts", timestamp_millis((col("doc_id") + 86400L) * 1000L))
    def drain(name: String, outDf: org.apache.spark.sql.DataFrame): Unit = {
      val q = outDf.writeStream.format("noop")
        .option("checkpointLocation", s"$out/ckpt-$name-${System.nanoTime()}")
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    val eval = docs.where(col("doc_id") % 97 === 0)
    for (run <- 1 to 2) {
      t(s"run$run stream nearDupAgainstIndex sf1")(
        drain("neardup", graft.streaming.DocStream.nearDupAgainstIndex(
          stream(), index, 0.5, "1 minute")))
      t(s"run$run stream decontaminate sf1")(
        drain("decon", graft.streaming.DocStream.decontaminate(
          stream().where(col("doc_id") % 97 =!= 0), eval, 3)))
      t(s"run$run stream dedupExact sf1")(
        drain("dedup", graft.streaming.DocStream.dedupExact(
          stream(), "1 minute")))
    }

    // ---- online ANN at 10×: 50 k vectors, √n-scaled cell count ----
    // deterministic 10× embeddings: per-copy sign flip of one rotating
    // coordinate (keeps norms, spreads copies across cells)
    val emb01 = graft.core.Tables(spark, sfDir, "embeddings")
    if (!new java.io.File(s"$out/embeddings.parquet").exists()) {
      val copies = (0 until 10).map { k =>
        if (k == 0) emb01
        else emb01
          .withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
          .withColumn("embedding", expr(
            s"transform(embedding, (x, i) -> IF(i % 10 = $k - 1, -x, x))"))
      }
      copies.reduce(_ unionByName _).repartition(8)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    val emb10 = spark.read.parquet(s"$out/embeddings.parquet")
    println(s"[scratch] sf1 vectors=${emb10.count()}")
    val (packed, centsRow) = t("simIndex build+persist sf1 (nCells=224)") {
      val (p, c) = graft.streaming.SimStream.ivfIndex(emb10, nCells = 224)
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val pp = p.persist(lvl); val cp = c.persist(lvl)
      pp.count(); cp.count()
      (pp, cp)
    }
    val qsch = emb10.schema
    for (run <- 1 to 2) {
      t(s"run$run stream ANN 10pct-queries sf1")(
        drain(s"sim$run", graft.streaming.SimStream.topKAgainstIvfIndex(
          spark.readStream.schema(qsch).parquet(s"$out/embeddings.parquet")
            .where(col("vec_id") % 10 === 0)
            .select("vec_id", "embedding"),
          packed, centsRow, k = 5)))
    }
    spark.stop()
  }
}
