package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling scratch — not part of the library surface. Edit the
  * body to time whatever is under investigation; keep measurements honest
  * by mirroring the driver flow (cold first action = the Verify shape,
  * post-warmup = the Bench shape). Session-cold numbers are dominated by
  * per-plan codegen/JIT at test scale — profile both.
  *
  * Current investigation (round 8): sf1 rehearsal of the STREAMING DQL
  * surface — the stateful half (slot collapse, fused funnel, derivate
  * keyed state) that round 7 rehearsed only for the doc/ANN operators.
  * A 10× events replay with 10× SERIES CARDINALITY (state scales with
  * keys, not rows: each copy shifts user_id, so the slot-collapse and
  * window state stores hold 10× the groups), fed through the file source
  * in 8 micro-batches (state carried across triggers), reporting rows/s
  * and per-operator state-store rows/bytes from StreamingQueryProgress.
  * Plus a re-timing of the online-ANN replay after the one-dot-per-
  * candidate kernel fix (SimStream two-pass transform).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/tmp/sf1_rehearsal"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
      r
    }
    // `sbt "runMain graft.Scratch <sfDir> ann"` → ANN block only (used for
    // the kernel A/B, where the DQL replays are 3 min of noise);
    // `... docs` → the decisions-capstone dup-heavy replay only
    val annOnly = args.contains("ann")
    val docsOnly = args.contains("docs")

    // ---- round-8: decisions capstone at 10×, DUP-HEAVY ----
    // 10 interleaved copies of every document 1 ms apart (unique doc_id,
    // same text) → ≥90% dup verdicts and a state store holding the whole
    // ACTIVE hash set at once (nothing evicts inside a 1 ms burst) — the
    // worst realistic shape for the first-arrival state.
    if (docsOnly) {
      val d01 = graft.core.Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      if (!new java.io.File(s"$out/docs10.parquet").exists()) {
        val copies = (0 until 10).map { k =>
          d01.select((col("doc_id") * 16 + lit(k)).as("doc_id"),
            timestamp_millis(col("doc_id") * 1000L + lit(k)).as("ts"),
            col("text"))
        }
        val all = copies.reduce(_ unionByName _).cache()
        val Array(lo, hi) = all.agg(
          unix_millis(min(col("ts"))), unix_millis(max(col("ts"))))
          .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
        val span = (hi - lo + 8) / 8
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(s"$out/docs10.parquet"))
        for (k <- 0 until 8) {
          val s0 = lo + k * span; val s1 = lo + (k + 1) * span
          all.where(unix_millis(col("ts")) >= s0 &&
              (unix_millis(col("ts")) < s1 || lit(k == 7)))
            .coalesce(1).write.mode("overwrite").parquet(s"$out/_dslice")
          val ls = java.nio.file.Files.list(
            java.nio.file.Paths.get(s"$out/_dslice"))
          val part = try ls.filter(_.getFileName.toString.startsWith("part-"))
            .findFirst().get() finally ls.close()
          val dst = java.nio.file.Paths.get(
            s"$out/docs10.parquet/slice-$k.parquet")
          java.nio.file.Files.move(part, dst,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(
              1000000000000L + k * 60000L))
        }
        all.unpersist()
      }
      val docs10 = spark.read.parquet(s"$out/docs10.parquet")
      val nDocs = docs10.count()
      println(s"[scratch] docs10 rows=$nDocs")
      def drainDecisions(name: String): Unit = {
        val src = spark.readStream.schema(docs10.schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$out/docs10.parquet")
          .repartition(8)
        val outDf = graft.streaming.DocStream.decisions(
          src, "1 second", retainMs = 60000L, qualityThreshold = 0.46)
        val t0 = System.nanoTime()
        val q = outDf.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        q.processAllAvailable()
        val secs = (System.nanoTime() - t0) / 1e9
        val progs = q.recentProgress
        val peakRows = progs.map(_.stateOperators.map(_.numRowsTotal).sum).max
        val peakMb = progs.map(
          _.stateOperators.map(_.memoryUsedBytes).sum).max / 1e6
        val dropped = progs.flatMap(_.stateOperators)
          .map(_.numRowsDroppedByWatermark).sum
        q.stop()
        val counts = spark.table(name).groupBy("decision").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap.toSeq.sorted
        spark.catalog.dropTempView(name)
        println(f"[scratch] $name: $secs%.2fs ${nDocs / secs}%.0f rows/s " +
          f"peakStateRows=$peakRows peakStateMem=$peakMb%.1fMB " +
          f"lateDropped=$dropped verdicts=$counts")
      }
      for (run <- 1 to 2) drainDecisions(s"dec$run")
      spark.stop(); return
    }

    // ---- synthesize the 10×-cardinality events replay (written once) ----
    // copies shift user_id (10× series), keep ts: same window count,
    // 10× state keys — the dimension streaming state actually scales in.
    // The replay must be TIME-ORDERED across micro-batches (the file
    // source replays oldest-mtime first; a random file split would let
    // batch 1 advance the watermark to max ts and drop everything after
    // as late): 8 time-range slices, one file each, mtimes forced
    // ascending.
    val ev01 = graft.core.Tables(spark, sfDir, "events")
      .select(timestamp_millis(expr("ts DIV 1000000")).as("ts"),
        col("event_type"), col("user_id"), col("value"))
    if (!new java.io.File(s"$out/events.parquet").exists()) {
      val copies = (0 until 10).map { k =>
        if (k == 0) ev01
        else ev01.withColumn("user_id", col("user_id") + lit(k * 1000000L))
      }
      val all = copies.reduce(_ unionByName _).cache()
      val Array(lo, hi) = all.agg(
        unix_millis(min(col("ts"))), unix_millis(max(col("ts"))))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
      val span = (hi - lo + 8) / 8
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$out/events.parquet"))
      for (k <- 0 until 8) {
        val s0 = lo + k * span; val s1 = lo + (k + 1) * span
        all.where(unix_millis(col("ts")) >= s0 &&
            (unix_millis(col("ts")) < s1 || lit(k == 7)))
          .coalesce(1).write.mode("overwrite").parquet(s"$out/_slice")
        val ls = java.nio.file.Files.list(java.nio.file.Paths.get(s"$out/_slice"))
        val part = try ls.filter(_.getFileName.toString.startsWith("part-"))
          .findFirst().get() finally ls.close()
        val dst = java.nio.file.Paths.get(s"$out/events.parquet/slice-$k.parquet")
        java.nio.file.Files.move(part, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + k * 60000L))
      }
      all.unpersist()
    }
    val ev10 = spark.read.parquet(s"$out/events.parquet")
    val nEvents = ev10.count()
    val nSeries = ev10.select("event_type", "user_id").distinct().count()
    println(s"[scratch] sf1 events=$nEvents series=$nSeries")

    val sch = ev10.schema
    def stream() = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1") // 8 slices → 8 micro-batches
      .parquet(s"$out/events.parquet")

    /** drain a DQL replay through the noop sink; report wall, rows/s, any
      * late-dropped rows (must be 0 on the ordered replay) and the PEAK
      * state-store footprint across micro-batches (the tail batch's
      * lastProgress is post-eviction — the watermark has already closed
      * earlier windows, which is the bounded-state design working)
      */
    def drainDql(name: String, dql: String): Unit = {
      val outDf = graft.streaming.StreamingDql.compile(stream(), dql,
        "1 second")
      val t0 = System.nanoTime()
      val q = outDf.writeStream.format("noop")
        .option("checkpointLocation", s"$out/ckpt-$name-${System.nanoTime()}")
        .outputMode("append").start()
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress
      def stateSum(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long) =
        progs.map(_.stateOperators.map(f).sum).max
      val peakRows = stateSum(_.numRowsTotal)
      val peakMb = stateSum(_.memoryUsedBytes) / 1e6
      val dropped = progs.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
      val nOps = progs.lastOption.map(_.stateOperators.length).getOrElse(0)
      q.stop()
      println(f"[scratch] $name: $secs%.2fs ${nEvents / secs}%.0f rows/s " +
        f"stateOps=$nOps peakStateRows=$peakRows peakStateMem=$peakMb%.1fMB " +
        f"lateDropped=$dropped")
    }

    for (run <- 1 to 2; if !annOnly) {
      // slot collapse + windowed agg: 2 stateful ops, state ∝ series
      drainDql(s"run$run dql avg_slots 10x",
        "SELECT avg('purchase'.* BUCKET 'testdata', 1 m) LAST 1 h")
      // fused funnel: the same 2 stateful ops for BOTH selectors
      drainDql(s"run$run dql fused multi 10x",
        "SELECT avg('purchase'.* BUCKET 'testdata', 1 m), " +
          "max('purchase'.* BUCKET 'testdata', 1 m) LAST 1 h")
      // mixed conf/value funnel (round 8): conf slot-set beside the avg
      drainDql(s"run$run dql multi_conf 10x",
        "SELECT avg('purchase'.* BUCKET 'testdata', 1 m), " +
          "count_above_conf('purchase'.* BUCKET 'testdata', 0.5, 1 m) LAST 1 h")
      // derivate: collapse + window agg + FMGWS keyed state (3 stateful)
      drainDql(s"run$run dql derivate 10x",
        "SELECT derivate(avg('purchase'.* BUCKET 'testdata', 1 m)) LAST 1 h")
    }

    // ---- online ANN at 10×: re-time after the kernel fix ----
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
    def drainSim(name: String, mod: Int): Unit = {
      val q = graft.streaming.SimStream.topKAgainstIvfIndex(
        spark.readStream.schema(qsch).parquet(s"$out/embeddings.parquet")
          .where(col("vec_id") % mod === 0)
          .select("vec_id", "embedding"),
        packed, centsRow, k = 5)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$out/ckpt-$name-${System.nanoTime()}")
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    for (run <- 1 to 2)
      t(s"run$run stream ANN 10pct-queries sf1")(drainSim(s"sim$run", 10))
    // kernel-bound shape for the one-dot-per-candidate A/B: ALL 20 k
    // vectors as queries, so the per-candidate cosine dominates the replay
    for (run <- 1 to 3)
      t(s"run$run stream ANN allq sf1")(drainSim(s"simall$run", 1))

    // ---- sq8 index: measured residency vs the float index + replay ----
    val (packedQ, centsQ) = t("sq8Index build+persist sf1 (nCells=224)") {
      val (p, c) = graft.streaming.SimStream.sq8Index(emb10, nCells = 224)
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val pp = p.persist(lvl); val cp = c.persist(lvl)
      pp.count(); cp.count()
      (pp, cp)
    }
    // both packed indexes are now cached — the storage listing is the
    // residency evidence (float rows vs int8 rows over the same corpus)
    for (info <- spark.sparkContext.getRDDStorageInfo)
      println(f"[scratch] cached id=${info.id} mem=${
        info.memSize / 1048576.0}%.1f MB disk=${
        info.diskSize / 1048576.0}%.1f MB name=${info.name}")
    def drainSimSq8(name: String, mod: Int): Unit = {
      val q = graft.streaming.SimStream.topKAgainstSq8Index(
        spark.readStream.schema(qsch).parquet(s"$out/embeddings.parquet")
          .where(col("vec_id") % mod === 0)
          .select("vec_id", "embedding"),
        packedQ, centsQ, k = 5)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$out/ckpt-$name-${System.nanoTime()}")
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    for (run <- 1 to 2)
      t(s"run$run stream sq8 ANN 10pct-queries sf1")(drainSimSq8(s"sq8$run", 10))
    spark.stop()
  }
}
