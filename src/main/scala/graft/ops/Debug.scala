package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** The `dqe_debug` passthrough equivalent (reference:
  * `src/dqe_debug.erl:18-40` logs each chunk + timing and re-emits
  * unchanged): `df.observe` attaches named metrics that the engine
  * computes DURING execution with zero extra passes — row counts, value
  * ranges, null rates. The returned [[Observation]] yields the metrics
  * after any action on the frame (each action builds its own
  * QueryExecution, so metric delivery goes through the observation's
  * listener, not the plan object).
  */
object Debug {
  /** re-emit the frame unchanged, observing its vitals. */
  def observed(df: DataFrame, name: String): (DataFrame, Observation) = {
    val obs = Observation(name)
    val out = df.observe(obs,
      count(lit(1)).as("rows"),
      min(col("ts_ms")).as("min_ts"),
      max(col("ts_ms")).as("max_ts"),
      sum(when(col("value").isNull, 1).otherwise(0)).as("null_values"))
    (out, obs)
  }
}
