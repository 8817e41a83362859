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
  */
object Parallel {
  def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
