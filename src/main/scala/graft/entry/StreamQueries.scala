package graft.entry

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Exact, SeriesOps}
import graft.streaming.StreamingDql

/** Correctness gates for the streaming DQL engine (SURVEY §2.10 /
  * StreamingDql): the events table replayed through Spark's FILE streaming
  * source — the production ingestion shape, no driver-side collect — with
  * the same DQL text the batch compiler runs, checked against a DuckDB
  * oracle over the same parquet.
  *
  *   - `stream_avg`: single-stage path (`slotExact=false`, update mode) —
  *     windowed decimal-exact avg over raw events.
  *   - `stream_avg_slots`: the DEFAULT slot-exact chained plan (append
  *     mode) — per-(series, 1 s slot) davg collapse under the 1 m window
  *     avg, the batch series model. Append emits on window close, so the
  *     staged source dir carries one far-future sentinel event that
  *     advances the watermark past every real window; the sentinel's own
  *     (never-closing) window is excluded by the `ws < SentinelMs` bound
  *     on both sides.
  *
  * These gates exist so a streaming regression (r6: the whole surface
  * failed at query start) is caught by the driver's CORRECTNESS run, not
  * only by the ScalaTest suites.
  */
object StreamQueries extends QueryProvider {
  /** 2100-01-01 UTC — far past any driver-generated event */
  private val SentinelMs = 4102444800000L
  private val WinMs = 60000L
  private val Dql = "SELECT avg('purchase'.* BUCKET 'testdata', 1 m) LAST 1 h"
  private val runSeq = new AtomicInteger(0)

  /** Staging dir for the file source: a copy of `events.parquet` plus the
    * one-row sentinel file. Built once per input dir and reused (contents
    * are deterministic functions of the input).
    */
  private def stagedDir(s: SparkSession, dir: String): String = synchronized {
    val staged = Paths.get("/tmp",
      "graft-stream-src-" + Integer.toHexString(dir.hashCode))
    val events = staged.resolve("events.parquet")
    val sentinel = staged.resolve("zz-sentinel.parquet")
    if (!Files.exists(events)) {
      Files.createDirectories(staged)
      Files.copy(Paths.get(dir, "events.parquet"), events,
        StandardCopyOption.REPLACE_EXISTING)
    }
    if (!Files.exists(sentinel)) {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val build = staged.resolve("_sentinel_build")
      // one 'purchase' event (matches the gate selector — only selected
      // rows advance the watermark) at SentinelMs, schema-shaped by an
      // arbitrary real row; ts is written as plain int64 nanos, which the
      // stream's long-typed schema reads uniformly with the real file
      s.read.parquet(events.toString).limit(1)
        .withColumn("ts", lit(SentinelMs * 1000000L))
        .withColumn("event_type", lit("purchase"))
        .withColumn("user_id", lit(0L))
        .withColumn("value", lit(0.0))
        .coalesce(1).write.mode("overwrite").parquet(build.toString)
      val part = Files.list(build).filter(_.getFileName.toString
        .startsWith("part-")).findFirst().get()
      Files.move(part, sentinel, StandardCopyOption.REPLACE_EXISTING)
      val rest = Files.list(build).iterator()
      while (rest.hasNext) Files.delete(rest.next())
      Files.delete(build)
    }
    staged.toString
  }

  /** Run the gate DQL over the staged replay; returns the finished result
    * as a batch frame (metric, ws, value) bounded to real windows.
    */
  private def runStream(s: SparkSession, dir: String,
                        slotExact: Boolean): DataFrame = {
    val staged = stagedDir(s, dir)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sch = s.read.parquet(s"$staged/events.parquet").schema
    val stream = s.readStream.schema(sch).parquet(staged)
      .select(timestamp_millis(expr("ts DIV 1000000")).as("ts"),
        col("event_type"), col("user_id"), col("value"))
    if (!slotExact) s.conf.set("spark.graft.streaming.slotExact", "false")
    val out =
      try StreamingDql.compile(stream, Dql, "0 seconds")
      finally s.conf.unset("spark.graft.streaming.slotExact")
    val name = s"graft_stream_gate_${runSeq.incrementAndGet()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(if (slotExact) "append" else "update").start()
    try q.processAllAvailable() finally q.stop()
    s.table(name).where(col("ws") < SentinelMs)
      .select("metric", "ws", "value")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_avg" -> ((s, d) => runStream(s, d, slotExact = false)),
    "stream_avg_slots" -> ((s, d) => runStream(s, d, slotExact = true)))

  def oracle: Map[String, String] = Map(
    // raw-event windowed mean, the single-stage stream
    "stream_avg" ->
      s"""SELECT event_type || '.' || CAST(user_id AS VARCHAR) AS metric,
         |       ${Exact.wstartSql("CAST(epoch_ms(ts) AS BIGINT)", WinMs)} AS ws,
         |       ${Exact.davgSql("value")} AS value
         |FROM events WHERE event_type = 'purchase'
         |GROUP BY 1, 2""".stripMargin,
    // slot-then-window mean, the batch series model the chained stream
    // mirrors (same derivation as the batch gates' series CTE)
    "stream_avg_slots" ->
      s"""WITH series AS (${SeriesOps.seriesSql})
         |SELECT metric, ${Exact.wstartSql("ts_ms", WinMs)} AS ws,
         |       ${Exact.davgSql("value")} AS value
         |FROM series WHERE mtype = 'purchase'
         |GROUP BY 1, 2""".stripMargin)
}
