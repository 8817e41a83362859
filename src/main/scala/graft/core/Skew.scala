package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for HOLISTIC aggregations.
  *
  * Algebraic aggregates (sum/avg/min/max/variance — everything in
  * [[Exact]]) need no salting: Spark's hash aggregation partially
  * aggregates map-side, so a hot key contributes one partial row per input
  * partition, not its full row set, to the shuffle. The aggregates that DO
  * concentrate a hot key into one task are the holistic ones — this
  * engine's exact percentile/median collect the key's window into a single
  * sorted array ([[graft.ops.Aggrs]], documented O(window) bound).
  *
  * [[saltedKth]] is the two-phase salted form: phase 1 groups on
  * (key, salt) — the hot key's rows spread over `salts` reducers, each
  * building a small sorted partial — and phase 2 merges the ≤ `salts`
  * pre-sorted partials per key. The final array assembly still holds one
  * key's window (inherent to an exact order statistic); what salting fixes
  * is the phase-1 shuffle skew and the single-task sort, which dominate on
  * a hot key at cluster scale. Joins need none of this by hand: AQE's
  * skew-join splitting is on wherever the engine builds a session.
  *
  * The salt is `pmod(hash(value, ts), salts)` — deterministic (replay-safe,
  * engine-comparable), uncorrelated with the key, and value-spreading.
  */
object Skew {

  /** Exact k-th-smallest (k = max(1, ceil(p·n))) per key over a possibly
    * skewed key distribution — same semantics as the unsalted
    * `Aggrs.spark("percentile", p)`, different shuffle shape.
    */
  def saltedKth(df: DataFrame, keys: Seq[String], v: String, ts: String,
                p: Double, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = df.withColumn("__salt",
      pmod(hash(col(v), col(ts)), lit(salts)))
    val partials = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sort_array(collect_list(col(v))).as("__part"))
    partials
      .groupBy(keys.map(col): _*)
      .agg(flatten(collect_list(col("__part"))).as("__all"))
      .withColumn("__sorted", boundedSorted(col("__all")))
      .select(keys.map(col) :+ kthOf(col("__sorted"), p).as("value"): _*)
  }

  /** sorted array with the same loud [[graft.ops.Aggrs.KthGroupRowBound]]
    * backstop as the unsalted path: salting engages precisely on the
    * groups big enough to need the bound, so the reassembled window —
    * still one key's full row set, inherent to an exact order
    * statistic — must fail descriptively, not as an executor OOM
    * (r17 review)
    */
  private def boundedSorted(all: Column): Column = {
    val bound = graft.ops.Aggrs.KthGroupRowBound
    when(size(all) <= lit(bound), array_sort(all))
      .otherwise(raise_error(concat(
        lit(s"percentile group exceeds KthGroupRowBound=$bound rows: "),
        size(all).cast("string"),
        lit(" — widen the resolution or pre-aggregate the window"))))
  }

  /** 0-based `get` (null out of bounds), not ANSI `element_at`: an
    * all-gap window collects an EMPTY array (collect_list skips the
    * null gap values), and the k-th of an empty window is NULL on both
    * engines — under Spark 4's default ANSI mode element_at(empty, 1)
    * would kill the query instead (r17 review; the determinism
    * conventions call for get() on any maybe-out-of-range lookup)
    */
  private def kthOf(sorted: Column, p: Double): Column =
    get(sorted,
      (greatest(lit(1L), ceil(lit(p) * size(sorted).cast("double"))
        .cast("long")) - 1L).cast("int"))

  /** The DQL-frame form of [[saltedKth]]: same output contract as the
    * unsalted windowed percentile compile — one row per `keys` group with
    * `value` = discrete k-th smallest and `confidence` = mean of the
    * group's confidence channel — but phase 1 shuffles on (keys, salt), so
    * a hot (series, window) group spreads over `salts` reducers instead of
    * concentrating its whole row set in one task.
    *
    * `df` must carry `__ts` (the raw point timestamp, kept for the salt —
    * the window start has replaced `ts_ms` in the keys by now), `value`,
    * and `confidence`. Value semantics are exactly the unsalted path's:
    * collect_list skips null values (gap rows), confidence averages over
    * every row AS A PLAIN DOUBLE sum/count — the same arithmetic the
    * unsalted `avg(confidence)` runs, so flipping the salted flag (or
    * crossing the autoRows bound as data grows) cannot move the
    * confidence bits (r17 review: a decimal-summed mean here truncated
    * fractional confidences differently from the unsalted path).
    */
  def saltedKthWindow(df: DataFrame, keys: Seq[String], p: Double,
                      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = df.withColumn("__salt",
      pmod(hash(col("value"), col("__ts")), lit(salts)))
    val partials = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sort_array(collect_list(col("value"))).as("__part"),
        sum(col("confidence")).as("__csum"),
        count(col("confidence")).as("__cn"))
    partials
      .groupBy(keys.map(col): _*)
      .agg(flatten(collect_list(col("__part"))).as("__all"),
        sum(col("__csum")).as("__csum2"), sum(col("__cn")).as("__cn2"))
      .withColumn("__sorted", boundedSorted(col("__all")))
      .select(keys.map(col) :+
        kthOf(col("__sorted"), p).as("value") :+
        (col("__csum2") / col("__cn2")).as("confidence"): _*)
  }
}
