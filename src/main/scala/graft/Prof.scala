package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main: times one pipeline query cold + steady with the
  * bench's cache hygiene (blocking transient release between runs).
  * `runMain graft.Prof [sfDir] [query ...]`
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("dedup_ngram", "dedup_minhash")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROF_SHUFFLE", "32"))
      // PROF_PARALLELISM_FIRST=false reproduces the r21 byte-sized-AQE
      // A/B (rejected — see Bench's session conf note)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("PROF_PARALLELISM_FIRST", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // direct subtree probes not in the gate surface
    import org.apache.spark.sql.functions._
    def docs10(s: SparkSession, d: String): org.apache.spark.sql.DataFrame = {
      val dd = graft.core.Tables(s, d, "documents").select("doc_id", "text")
      (0 until 10).map(k =>
        dd.select((col("doc_id") * 16 + lit(k)).as("doc_id"), col("text")))
        .reduce(_ unionByName _)
    }
    val extra: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      // docsWide keyed-vs-keyless A/B (r21): the keyless (round-robin)
      // widen forms of three docsWide consumers that moved in the final
      // drive — run against the gate (keyed) in one session
      "scrub_keyless" -> ((s, d) =>
        graft.pipeline.Dedup.substringScrub(
          graft.core.Parallel.widen(graft.core.Tables(s, d, "documents")),
          8).orderBy("doc_id")),
      "spans_keyless" -> ((s, d) =>
        graft.pipeline.Dedup.substringSpans(
          graft.core.Parallel.widen(graft.core.Tables(s, d, "documents")),
          8).orderBy("doc_id")),
      // decon_ngram A/B (r21): the pre-r21 explode → broadcast join →
      // count_distinct derivation, kept as a probe so the shipped
      // row-local UDF kernel stays comparable against it
      "decon_join" -> ((s, d) => {
        val all = graft.core.Tables(s, d, "documents")
        val train = all.where(col("doc_id") % 97 =!= 0)
        val eval = all.where(col("doc_id") % 97 === 0)
        val evalSh = graft.pipeline.Dedup.shingles3(eval)
          .select("shingle").distinct()
        graft.pipeline.Dedup.shingles3(train)
          .join(broadcast(evalSh), Seq("shingle"))
          .groupBy("doc_id")
          .agg(count_distinct(col("shingle")).as("n_overlap"))
          .where(col("n_overlap") >= 3).orderBy("doc_id")
      }),
      "simhash_fp" -> ((s, d) =>
        graft.pipeline.Dedup.simhash(graft.core.Tables(s, d, "documents"))),
      "docs_len" -> ((s, d) =>
        graft.core.Tables(s, d, "documents")
          .agg(sum(length(col("text"))))),
      // events_filter_* cold-run bisection ladder (round 11): raw scan →
      // + ts normalize → + json-path cmp → + regex → + global sort
      "series_scan" -> ((s, d) =>
        graft.core.SeriesOps.series(s, d).agg(sum(col("value")))),
      "series_scan_sum" -> ((s, d) =>
        graft.core.SeriesOps.series(s, d)
          .where(col("mtype").isin("purchase", "error"))
          .groupBy(col("metric"))
          .agg(sum(col("value")).as("value"))),
      "series_davg_nosort" -> ((s, d) =>
        graft.core.SeriesOps.series(s, d)
          .where(col("mtype").isin("purchase", "error"))
          .groupBy(col("metric"),
            graft.core.Exact.wstart(col("ts_ms"), 3600000L).as("ws"))
          .agg(graft.core.Exact.davg(col("value")).as("value"))),
      "series_filter_global" -> ((s, d) =>
        graft.core.SeriesOps.series(s, d)
          .where(col("mtype").isin("purchase", "error"))
          .agg(sum(col("value")))),
      "series_group_nofilter" -> ((s, d) =>
        graft.core.SeriesOps.series(s, d)
          .groupBy(col("metric")).agg(sum(col("value")))),
      "series_group_long" -> ((s, d) =>
        graft.core.SeriesOps.series(s, d)
          .where(col("mtype").isin("purchase", "error"))
          .groupBy(col("muser")).agg(sum(col("value")))),
      "ev_scan" -> ((s, d) =>
        graft.core.Tables(s, d, "events").select("event_id", "event_type", "value")),
      "ev_tsms" -> ((s, d) =>
        graft.core.SeriesOps.events(s, d).select("event_id", "ts_ms", "value")),
      "ev_json" -> ((s, d) => {
        val ev = graft.core.SeriesOps.events(s, d)
        ev.where(get_json_object(col("props"), "$.k").cast("double") < 30)
          .select("event_id", "ts_ms", "event_type", "value")
      }),
      "ev_regex" -> ((s, d) => {
        val ev = graft.core.SeriesOps.events(s, d)
        ev.where(col("event_type").rlike("pur|cli"))
          .select("event_id", "ts_ms", "event_type", "value")
      }),
      "ev_nosort" -> ((s, d) => {
        val ev = graft.core.SeriesOps.events(s, d)
        ev.where(col("event_type").rlike("pur|cli") &&
            get_json_object(col("props"), "$.k").cast("double") < 30)
          .select("event_id", "ts_ms", "event_type", "value")
      }),
      // r16 SortAggregate-demotion A/B at 10× corpus: the minhash
      // signature with LONG channel buffers (shipped, HashAggregate with
      // map-side combine) vs the r15 STRING-substring form (SortAggregate)
      "sig_long10" -> ((s, d) =>
        graft.pipeline.Dedup.signatureForProfile(docs10(s, d))),
      // the shipped r16 form: native per-doc kernel, zero exchange
      "sig_native10" -> ((s, d) =>
        graft.pipeline.Dedup.signatureRowLocal(docs10(s, d), 3)),
      "bandindex10" -> ((s, d) =>
        graft.pipeline.Dedup.bandIndex(docs10(s, d))),
      "sig_string10" -> ((s, d) => {
        val sh = graft.pipeline.Dedup.shingles3(docs10(s, d))
        val seeds = graft.pipeline.Dedup.Seeds
        val chans = graft.pipeline.Dedup.Channels
        val hashed = sh.select(col("doc_id") +:
          (0 until seeds).map(x =>
            md5(concat_ws("|", lit(x.toString), col("shingle"))).as(s"h$x")): _*)
        val mhAggs = for (x <- 0 until seeds; c <- 0 until chans)
          yield min(substring(col(s"h$x"), c * 8 + 1, 8)).as(s"mh${x}_$c")
        hashed.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*)
      }))

    val diag = new BenchDiag(spark)
    if (sys.env.contains("PROF_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = e.stageInfo
            val m = si.taskMetrics
            if (m != null && m.executorCpuTime > 100000000L)
              println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
                f"cpu=${m.executorCpuTime / 1000000}ms " +
                f"run=${m.executorRunTime}ms rows=${m.inputMetrics.recordsRead} " +
                f"name=${si.name.take(60)}")
          }
        })
    for (name <- names) {
      val q = extra.getOrElse(name, SparkEntry.queries(name))
      if (sys.env.contains("PROF_EXPLAIN"))
        q(spark, sfDir).explain("formatted")
      val runs = sys.env.getOrElse("PROF_RUNS", "3").toInt
      for (i <- 0 until runs) {
        graft.core.Caches.releaseTransient(spark, blocking = true)
        val m0 = diag.mark()
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets Catalyst prune a projected
        // probe subtree to nothing and the "timing" measures a bare scan
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val d = diag.measure(m0).toMap
        println(f"[prof] $name run$i: $dt%.2fs  cpu=${d("cpu_ms")}ms " +
          f"tasks=${d("tasks")} jit=${d("jit_ms")}ms cls=${d("classes_loaded")} " +
          f"cg_n=${d("codegen_n")} shuffle_r=${d("shuffle_read")}")
      }
    }
    spark.stop()
  }
}
