package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling scratch — not part of the library surface. Edit the
  * body to time whatever is under investigation; keep measurements honest
  * by mirroring the driver flow (cold first action = the Verify shape,
  * post-warmup = the Bench shape). Session-cold numbers are dominated by
  * per-plan codegen/JIT at test scale — profile both.
  *
  * Current investigation (round 18): the streaming-gate warm floor. The
  * settled r17 bench spends 113 s across 80 stream gates (~1.4 s each)
  * with provisioning (staging, query start/stop) measured at only 4.3 s
  * total and run2 ≈ run1 — so the cost is inside the micro-batch drain
  * itself. This probe attributes each replay's wall time to the
  * StreamingQueryProgress duration phases (addBatch, queryPlanning,
  * walCommit, commitOffsets, getBatch, latestOffset) per batch, to find
  * which phase carries the floor and whether it is per-batch machinery
  * (state-store commits, offset log) or genuine compute.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("stream_avg", "stream_quality", "stream_bpe_encode")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val batches = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, java.util.Map[String, java.lang.Long], Long)]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit = {
          batches.add((e.progress.name, e.progress.batchId,
            e.progress.durationMs, e.progress.numInputRows)); ()
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit = ()
      })

    for (name <- names; run <- 0 until 3) {
      graft.core.Caches.releaseTransient(spark, blocking = true)
      batches.clear()
      val p0 = graft.core.Provisioning.snapshotNs
      val cg0 = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val prov = (graft.core.Provisioning.snapshotNs - p0) / 1e9
      val cg = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount - cg0
      // listener events are async; give the bus a beat
      Thread.sleep(300)
      println(f"[scratch] $name run$run wall=$wall%.2fs prov=$prov%.2fs cg_n=$cg")
      val it = batches.iterator()
      while (it.hasNext) {
        val (qn, bid, dur, rows) = it.next()
        val phases = new StringBuilder
        dur.forEach((k, v) => { phases ++= s" $k=${v}ms"; () })
        println(s"[scratch]   $qn batch=$bid rows=$rows$phases")
      }
    }
    spark.stop()
  }
}
