package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.{Exact, SeriesOps}

/** Streaming ingestion into the production series layout — the lifecycle
  * piece the reference delegates entirely to its storage backend (SURVEY
  * §2.10: "no streaming ingestion; late data is the storage layer's
  * problem"). Here the storage layer is OURS (core/Layout), so the loop
  * closes: an event stream lands as the dt-partitioned parquet series
  * table, and the batch DQL engine (dql/LayoutStore binding) queries it
  * with partition pruning — ingest → store → query, one library.
  *
  * Semantics match the batch derivation exactly: 1 s slot means via the
  * Exact decimal convention (associative — the same value whatever the
  * batch boundaries), watermark finalizes slots before they are written
  * (append mode), late points beyond the watermark are dropped — a
  * DOCUMENTED policy rather than the reference's undefined behavior.
  *
  * Scale: the sink appends one parquet file set per (micro-batch, dt);
  * partition count follows the shuffle setting, state is bounded by the
  * watermark, and the layout's dt pruning applies to readers immediately.
  */
object SeriesIngest {

  /** raw event stream (ts: timestamp, event_type, user_id, value) →
    * running query writing the slot-aggregated series into `path`
    * (dt-partitioned, same schema as [[SeriesOps.series]] + dt).
    */
  def start(events: DataFrame, path: String, checkpoint: String,
            watermark: String = "10 seconds"): StreamingQuery =
    slotted(events, watermark).writeStream
      .format("parquet")
      .partitionBy("dt")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** the transform alone (testable without a sink): watermarked 1 s slot
    * means in the series-table shape
    */
  def slotted(events: DataFrame, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        window(col("ts"), s"${SeriesOps.ResolutionMs} milliseconds").as("w"),
        col("event_type").as("mtype"), col("user_id").as("muser"))
      .agg(Exact.davg(col("value")).as("value"))
      .select(
        concat_ws(".", col("mtype"), col("muser")).as("metric"),
        col("mtype"), col("muser"),
        unix_millis(col("w.start")).as("ts_ms"), col("value"))
      // dt derived timezone-independently — must agree with
      // Layout.writeSeriesPartitioned / rangeScan's UTC bounds
      .withColumn("dt", date_from_unix_date(
        ((col("ts_ms") - pmod(col("ts_ms"), lit(86400000L))) / 86400000L)
          .cast("int")))
}
