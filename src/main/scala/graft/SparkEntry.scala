package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.entry._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query families live in `graft.entry.*` providers; each provider pairs
  * Spark queries with DuckDB oracle SQL producing identical columns/values.
  */
object SparkEntry {
  private val providers: Seq[QueryProvider] =
    Seq(TpchQueries, AggrQueries, TransQueries, CombQueries, GroupQueries,
      LimitQueries, EventQueries, HistQueries, PipelineQueries, DqlQueries,
      JoinQueries, StreamQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * hourly mean of every series (the reference's bread-and-butter
    * `avg(m, 1h)` shape, SURVEY §2.2).
    */
  def entry(spark: SparkSession): DataFrame =
    AggrQueries.queries("aggr_avg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    providers.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    providers.flatMap(_.oracle).toMap
}
