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
    // "heap" mode: run the named gates once each, then force GC and
    // report retained heap — the isolation-off retention experiment
    val heapMode = args.contains("heap")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional "parts=N" arg: replay state-store partition A/B
    val parts = args.collectFirst {
      case a if a.startsWith("parts=") => a.stripPrefix("parts=")
    }
    val names = {
      val qs = args.drop(1)
        .filterNot(a => a.startsWith("parts=") || a == "heap"
          || a.startsWith("isolation=")).toSeq
      if (qs.nonEmpty) qs
      else Seq("stream_avg", "stream_quality", "stream_bpe_encode")
    }
    val isolation = args.collectFirst {
      case a if a.startsWith("isolation=") => a.stripPrefix("isolation=")
    }.getOrElse("false")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.artifact.isolation.enabled", isolation)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    parts.foreach(p =>
      spark.conf.set("spark.graft.stream.replay.partitions", p))

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

    // --- codegen-cache key forensics: why do identical re-runs Janino-
    // recompile? Keys are (weakref(contextClassLoader), CodeAndComment) —
    // misses can be source drift (body differs run-to-run) or scope drift
    // (same body under a different classloader). Reflection-only probe.
    def cacheKeys(): Seq[(String, Int, String)] = try {
      val modCls = Class.forName(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$")
      val mod = modCls.getField("MODULE$").get(null)
      val f = modCls.getDeclaredField("cache")
      f.setAccessible(true)
      val nfs = f.get(mod)
      val lc = nfs.getClass.getMethod("loadingCache").invoke(nfs)
      val asMap = Class.forName("org.sparkproject.guava.cache.Cache")
        .getMethod("asMap").invoke(lc)
        .asInstanceOf[java.util.Map[AnyRef, AnyRef]]
      val out = Seq.newBuilder[(String, Int, String)]
      asMap.keySet().forEach { k =>
        val t = k.asInstanceOf[Tuple2[AnyRef, AnyRef]]
        val clRef = t._1.getClass.getMethod("get").invoke(t._1)
        val cl = if (clRef == null) "collected"
          else s"${clRef.getClass.getSimpleName}@${System.identityHashCode(clRef).toHexString}"
        val body = t._2.getClass.getMethod("body").invoke(t._2)
          .asInstanceOf[String]
        out += ((cl, body.hashCode, body))
      }
      out.result()
    } catch { case e: Throwable =>
      println(s"[scratch] cacheKeys probe failed: $e"); Seq.empty }
    val keySnaps = scala.collection.mutable.Map.empty[
      (String, Int), Seq[(String, Int, String)]]

    if (heapMode) {
      for (name <- names) {
        graft.core.Caches.releaseTransient(spark, blocking = true)
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      graft.core.Caches.releaseTransient(spark, blocking = true)
      val rt = Runtime.getRuntime
      (1 to 5).foreach { _ => System.gc(); Thread.sleep(500) }
      println(f"[scratch] heap retained after ${names.size} gates " +
        f"(isolation=$isolation): ${(rt.totalMemory - rt.freeMemory) / (1 << 20)} MB; " +
        f"loaded classes: ${java.lang.management.ManagementFactory
          .getClassLoadingMXBean.getLoadedClassCount}")
      spark.stop()
      return
    }

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
      keySnaps((name, run)) = cacheKeys()
      if (run == 2) {
        // classify run2's fresh compiles against run1's key set
        val prev = keySnaps((name, 1))
        val prevBodies = prev.map(_._2).toSet
        val prevKeys = prev.map(k => (k._1, k._2)).toSet
        val fresh = keySnaps((name, run)).filterNot(k =>
          prevKeys.contains((k._1, k._2)))
        val (scopeDrift, srcDrift) =
          fresh.partition(k => prevBodies.contains(k._2))
        println(s"[scratch] $name run2 fresh-compiles=${fresh.size} " +
          s"scope-drift=${scopeDrift.size} source-drift=${srcDrift.size} " +
          s"loaders=${keySnaps((name, run)).map(_._1).distinct.sorted}")
        // show a unified-ish diff of ONE drifted source against its
        // closest run1 body (same class-name prefix, closest length)
        srcDrift.headOption.foreach { case (_, _, body) =>
          val cand = prev.map(_._3)
            .minByOption(b => math.abs(b.length - body.length))
          cand.foreach { b =>
            val a1 = body.linesIterator.toVector
            val b1 = b.linesIterator.toVector
            val diffs = a1.zip(b1).zipWithIndex.collect {
              case ((x, y), i) if x != y => s"  L$i\n  + $x\n  - $y"
            }
            println(s"[scratch] first drifted source vs closest run1 body " +
              s"(${diffs.size} differing lines of ${a1.size}):")
            diffs.take(12).foreach(println)
          }
        }
      }
    }
    spark.stop()
  }
}
