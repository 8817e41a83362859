package graft.dql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.SeriesOps

/** Storage/tag-index abstraction behind the DQL compiler (the reference's
  * `ddb_connection` + `dqe_idx` seams, SURVEY §1.5): provides per-bucket
  * resolution, the long-format series frame, the tag-column mapping, and
  * the event stream. Swap this for a production catalog (Delta tables,
  * partitioned parquet) without touching the compiler.
  */
trait SeriesStore {
  def resolutionMs(bucket: String): Long
  /** (metric, <tag cols...>, ts_ms, value) */
  def series(spark: SparkSession, bucket: String): DataFrame
  /** DQL `ns:key` tag → physical column name */
  def tagCol(ns: String, key: String): Option[String]
  def tagCols: Seq[String]
  def events(spark: SparkSession, bucket: String): DataFrame
}

/** The driver-testdata store: one bucket ("testdata") at 1 s resolution,
  * series derived from `events` (SURVEY §1.5 mapping; FIXTURES.md B),
  * tags `type` (event_type) and `user` (user_id).
  */
final class TestdataStore(dir: String) extends SeriesStore {
  def resolutionMs(bucket: String): Long = SeriesOps.ResolutionMs
  def series(spark: SparkSession, bucket: String): DataFrame =
    SeriesOps.series(spark, dir)
  def tagCol(ns: String, key: String): Option[String] = key match {
    case "type" => Some("mtype")
    case "user" => Some("muser")
    case _      => None
  }
  val tagCols: Seq[String] = Seq("mtype", "muser")
  def events(spark: SparkSession, bucket: String): DataFrame =
    SeriesOps.events(spark, dir)
}
