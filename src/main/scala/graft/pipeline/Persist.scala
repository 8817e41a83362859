package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache-lifetime handoff for pipeline builders.
  *
  * Builders persist heavyweight intermediates (shingle tables, candidate
  * pair sets, assigned-vector tables) that several downstream joins reuse.
  * Left alone, those persists accumulate across a many-query run until the
  * block manager's LRU evicts them — correct, but it adds eviction noise at
  * bench time and squats on executor storage at scale. `handoff` pins the
  * (small) RESULT instead: it forces the result into its own cache, then
  * releases every intermediate, so a builder's storage footprint after
  * return is exactly its output.
  */
private[pipeline] object Persist {
  def handoff(result: DataFrame, release: DataFrame*): DataFrame = {
    val out = result.persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize before the inputs disappear
    release.foreach(_.unpersist(blocking = false))
    out
  }
}
