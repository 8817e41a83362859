package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Exact

/** Streaming event-sequence analytics: the online forms of
  * [[graft.ops.Sessions]]. Sessionization is THE canonical stateful
  * streaming aggregation — Spark's `session_window` keeps one merging
  * window per (user, open session) and emits a session exactly once, when
  * the watermark passes its close (last event + gap). State is bounded by
  * the number of concurrently-open sessions, not history: a closed
  * session's state is dropped at emission, so a year-long firehose holds
  * state ∝ active users, the same bound a dedicated sessionizer service
  * carries.
  */
object EventStream {
  /** Gap-based streaming sessionization over an event stream carrying
    * (`ts` timestamp, `user_id`, `value`).
    *
    * Emits (user_id, session_start, session_last, n_events, sum_value)
    * per closed session — `session_window.end` is last-event + gap by
    * definition, so `session_last` (the last event's epoch millis)
    * subtracts the gap back out, aligning with the batch
    * [[graft.ops.Sessions.sessionize]] columns bit-for-bit: Spark's
    * session merge is the same closed/open `[t, t+gap)` boundary as the
    * batch `diff >= gap` split, and the value total runs through the
    * decimal-exact fold (order-independent across micro-batch merges).
    */
  def sessionize(events: DataFrame, gapMs: Long,
                 delay: String): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMs milliseconds"))
      .agg(count(lit(1)).as("n_events"),
        Exact.dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start"),
        (unix_millis(col("session_window.end")) - gapMs).as("session_last"),
        col("n_events"), col("sum_value"))
}
