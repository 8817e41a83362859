package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static as-of enrichment: attach to every arriving left row the
  * static right side's value at the greatest right timestamp ≤ the row's
  * timestamp, per key — the online form of
  * [[graft.operators.AsofJoin.asof]] (enriching a firehose with the
  * latest prior observation from a slowly-changing reference table).
  *
  * The batch operator's union+window sweep cannot run on a stream (a
  * non-windowed sort is unbounded state). Instead the static side is
  * PACKED — one row per key carrying its (ts, value) history sorted by
  * time, the same materialized-index posture as `SimStream`'s packed
  * ANN cells — and the stream takes one stateless equi-join on the key
  * plus a row-local fold over the packed history (the engine-side analog
  * of a binary search; per-key history is reference-data-sized). Zero
  * stateful operators, so replay order cannot change any answer.
  *
  * At scale the packed index is a batch-refreshed artifact (rebuild =
  * one groupBy of the reference table); the per-event cost is one join
  * probe + one in-row scan.
  */
object AsofStream {

  /** Pack the static right side: one row per key, history sorted by ts.
    * `right` must be unique per (key, ts) — the same precondition as the
    * batch operator (pre-aggregate upstream if not).
    */
  def packed(right: DataFrame, key: Seq[String], ts: String,
             valueCol: String): DataFrame =
    right.groupBy(key.map(col): _*)
      .agg(sort_array(collect_list(struct(col(ts).as("t"),
        col(valueCol).as("v")))).as("__tv"))

  /** Enrich the streaming `left` with the as-of value from a [[packed]]
    * right side, as column `as` (NULL when no right point precedes).
    */
  def asof(left: DataFrame, packedRight: DataFrame, key: Seq[String],
           ts: String, as: String): DataFrame = {
    val hits = filter(col("__tv"), x => x.getField("t") <= col(ts))
    left.join(packedRight, key, "left")
      .withColumn(as,
        when(size(hits) > 0, element_at(hits, size(hits)).getField("v")))
      .drop("__tv")
  }
}
