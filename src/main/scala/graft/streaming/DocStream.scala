package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The training-data pipeline on a document STREAM: the batch operators
  * from `graft.pipeline` re-hosted on Structured Streaming where their
  * shape allows it.
  *
  *   - exact dedup: `dropDuplicatesWithinWatermark` on the text hash —
  *     first occurrence wins, dedup state is evicted once the watermark
  *     passes (bounded by arrival-rate × watermark, NOT corpus size; the
  *     production posture for a firehose where historical dedup is a
  *     separate batch join against the corpus index)
  *   - quality / language-ID / token stats: row-local (narrow) — the
  *     IDENTICAL batch functions run unchanged on the stream; no
  *     re-implementation, which is the point of building operators as
  *     `DataFrame => DataFrame` transforms
  *
  * Pairwise families (MinHash/SimHash/n-gram) need cross-row joins over
  * the accumulating corpus — stream-static joins against a periodically
  * refreshed batch index, deliberately not stream-stream.
  */
object DocStream {

  /** input: streaming frame (ts: timestamp, doc_id, text) */
  def dedupExact(docs: DataFrame, watermark: String): DataFrame =
    docs.withWatermark("ts", watermark)
      .withColumn("text_hash", md5(col("text")))
      .dropDuplicatesWithinWatermark("text_hash")

  /** exact-dedup then score: kept documents annotated with the SAME
    * quality operator the batch gates verify — a narrow projection, so it
    * composes with the streaming dedup without any extra state or join.
    */
  def curate(docs: DataFrame, watermark: String): DataFrame =
    graft.pipeline.TextOps.withQuality(dedupExact(docs, watermark))
}
