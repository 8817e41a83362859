package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Salted two-phase holistic aggregation: same exact order statistic as
  * the single-phase form, with the hot key's phase-1 work spread across
  * salt partitions.
  */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("saltedKth matches the unsalted exact percentile on a skewed key mix") {
    // one hot key with 200k rows, 50 cold keys with 40 rows each
    val hot = spark.range(200000).selectExpr("'hot' AS k",
      "id AS ts_ms", "CAST((id * 48271) % 100003 AS DOUBLE) AS v")
    val cold = spark.range(2000).selectExpr(
      "CONCAT('c', CAST(id % 50 AS STRING)) AS k",
      "id AS ts_ms", "CAST((id * 16807) % 9973 AS DOUBLE) AS v")
    val df = hot.unionByName(cold)

    val agg = graft.ops.Aggrs.spark("percentile", Some(0.9))
    val direct = df.groupBy("k")
      .agg(agg(col("v"), col("ts_ms")).as("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedKth(df, Seq("k"), "v", "ts_ms", 0.9, salts = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    assert(salted.size == 51)
    assert(salted == direct)
  }

  test("phase 1 spreads the hot key across salt groups") {
    val hot = spark.range(10000).selectExpr("'hot' AS k", "id AS ts_ms",
      "CAST(id AS DOUBLE) AS v")
    val parts = hot.withColumn("__salt",
      pmod(hash(col("v"), col("ts_ms")), lit(16)))
      .groupBy("k", "__salt").count().collect()
    // all 16 salt groups populated, none holding the whole key
    assert(parts.length == 16)
    assert(parts.map(_.getLong(2)).max < 10000)
  }
}
