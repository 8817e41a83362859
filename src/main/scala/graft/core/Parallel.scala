package graft.core

import org.apache.spark.sql.DataFrame

/** Compute-parallelism decoupled from storage layout.
  *
  * Spark parallelizes a parquet scan by row-group splits; a table that
  * arrives as fewer splits than cores (the local-test shape — one small
  * file, one row group) runs every downstream map-side stage on a
  * fraction of the machine. For compute-bound stages (hashing, regex,
  * decimal aggregation) that is the bottleneck long before IO is.
  *
  * [[widen]] inserts a round-robin repartition to the session's default
  * parallelism ONLY when the scan yields fewer splits — on any realistic
  * large layout (row groups ≫ cores) it is a no-op and adds no shuffle.
  * Place it between the scan's filters and the heavy compute so pushdown
  * is unaffected and the exchange carries already-filtered rows.
  *
  * widen must sit directly above a scan: counting the input splits goes
  * through `df.rdd`, which physically plans the frame and — if the plan
  * contained an exchange or a subquery — would EXECUTE those upstream
  * stages on the spot (AQE materializes query stages when the RDD is
  * requested). Guarded, not just documented: a plan with an exchange or
  * subquery is returned unchanged (its shuffle already sets downstream
  * parallelism), so `df.rdd` is only ever consulted on exchange-free
  * scan plans, where building the RDD lineage runs nothing.
  */
object Parallel {
  /** [[widen]] variant for WIDE rows: hash-repartitions on `key` instead
    * of round-robin. Keyless `repartition(n)` first locally SORTS its
    * input (`spark.sql.execution.sortBeforeRepartition`, on by default —
    * retried tasks must reproduce the row-to-partition assignment), and
    * on a wide fact row that sort costs more than the downstream compute
    * the widen exists to parallelize (measured r20 on tpch_q1: keyless
    * widen cpu 5–9 s vs the 1.2 s serial aggregation it replaced). A
    * hash partitioning is deterministic per row, so it skips the sort;
    * `key` must be high-cardinality relative to the core count (guide
    * §2.5 — 20–100× more distinct values than partitions) so the spread
    * is even. Same no-op guard as [[widen]]: realistic layouts with
    * splits ≥ cores return unchanged.
    */
  def widenBy(df: DataFrame,
              key: org.apache.spark.sql.Column): DataFrame =
    widenWith(df, p => df.repartition(p, key))

  def widen(df: DataFrame): DataFrame =
    widenWith(df, p => df.repartition(p))

  private def widenWith(df: DataFrame,
                        re: Int => DataFrame): DataFrame = {
    // a streaming frame cannot be physically planned outside its query
    // (and its parallelism is the source's/shuffle's business anyway)
    if (df.isStreaming) return df
    // planning only, never executes. Exchanges are inserted during
    // executedPlan preparation (EnsureRequirements), and under AQE the
    // adaptive wrapper is only installed when the plan HAS exchanges or
    // subqueries — so the wrapper's presence is itself the signal.
    val plan = df.queryExecution.executedPlan
    val unsafe =
      plan.isInstanceOf[
        org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec] ||
      plan.exists {
        case _: org.apache.spark.sql.execution.exchange.Exchange => true
        case p => p.expressions.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
      }
    if (unsafe) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p) re(p) else df
    }
  }
}
