package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A family of gate queries: each name maps to a Spark query (run by
  * `graft.Verify` / the driver) and, where SQL-expressible, a DuckDB oracle
  * statement computing the same result with the same column names.
  */
trait QueryProvider {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
