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

  /** Raised by [[queryStrict]] on an empty result — parity with the
    * reference's explicit `no_results` error from the collecting funnel
    * (`src/dqe_funnel.erl:23-31`): a user polling a dead series gets a
    * signal, not silence.
    */
  final case class NoResultsException(dql: String)
    extends RuntimeException(s"no_results: $dql")

  /** [[query]] that MATERIALIZES the reference's empty-result contract: the
    * lazy DataFrame API cannot know emptiness without executing, so this
    * variant eagerly checks (one `isEmpty` action — a limit-1 scan, not a
    * full count) and throws [[NoResultsException]] like `dqe_funnel` does.
    */
  def queryStrict(spark: SparkSession, store: SeriesStore, dql: String,
                  nowMs: Long): DataFrame = {
    val df = Compiler.run(spark, store, nowMs, dql)
    if (df.isEmpty) throw NoResultsException(dql)
    df
  }

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
