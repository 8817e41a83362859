package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dql.{Compiler, SeriesStore, TestdataStore}

/** User-facing entry point: run DQL text against a series store.
  *
  * {{{
  * val df = Graft.query(spark, "/data/sf0.01",
  *   "SELECT avg('purchase'.'3' BUCKET 'testdata', 1 h) LAST 1 d")
  * }}}
  *
  * A reference (dalmatinerdb/dqe) user's queries run verbatim; results come
  * back as DataFrames `(name, metric, ts_ms, value[, metadata])` — or the
  * event frame for EVENTS queries — instead of the reference's reply maps.
  */
object Graft {
  /** query the driver-testdata layout at `dataDir` */
  def query(spark: SparkSession, dataDir: String, dql: String,
            nowMs: Long = System.currentTimeMillis()): DataFrame =
    Compiler.run(spark, new TestdataStore(dataDir), nowMs, dql)

  /** query an arbitrary store binding */
  def query(spark: SparkSession, store: SeriesStore, dql: String,
            nowMs: Long): DataFrame =
    Compiler.run(spark, store, nowMs, dql)

  /** Register the engine's tables as temp views for plain Spark SQL —
    * everything the reference lacks (joins, grouping sets, rollup, window
    * functions; SURVEY §2.10) comes for free on the same data:
    * `graft_series`, `graft_events`, `graft_documents`, `graft_embeddings`.
    */
  def registerViews(spark: SparkSession, dataDir: String): Unit = {
    graft.core.SeriesOps.series(spark, dataDir)
      .createOrReplaceTempView("graft_series")
    graft.core.SeriesOps.events(spark, dataDir)
      .createOrReplaceTempView("graft_events")
    graft.core.Tables(spark, dataDir, "documents")
      .createOrReplaceTempView("graft_documents")
    graft.core.Tables(spark, dataDir, "embeddings")
      .createOrReplaceTempView("graft_embeddings")
  }
}
