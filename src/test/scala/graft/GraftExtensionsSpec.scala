package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The spark.sql.extensions entry point: a session configured with
  * graft.GraftExtensions gets the custom physical strategy and the
  * graft_dot SQL function with no Scala API involved.
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("graft_dot is callable from SQL and exact") {
    val v = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(v == 11.0)
  }

  test("graft_dot works on float arrays (embedding shape)") {
    val v = spark.sql(
      "SELECT graft_dot(array(CAST(0.5 AS FLOAT), CAST(0.25 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(v == 2.0)
  }

  test("graft_fingerprint is callable from SQL") {
    val v = spark.sql("SELECT graft_fingerprint('abcdefghi') AS fp")
      .collect().head.getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val h1 = md.digest("abcdefgh".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h2 = java.security.MessageDigest.getInstance("MD5")
      .digest("bcdefghi".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(v == Seq(h1, h2).min)
    assert(spark.sql("SELECT graft_fingerprint('ab', 2) AS fp")
      .collect().head.getString(0).length == 32)
  }

  test("the gap-fill strategy is injected") {
    assert(spark.sessionState.planner.strategies
      .exists(_.getClass.getName.contains("GapFillStrategy")) ||
      spark.experimental.extraStrategies.contains(graft.plans.GapFillStrategy) ||
      {
        // injected strategies live in the extensions' strategy list; the
        // robust check is behavioral: plan a GapFill node and find its exec
        import org.apache.spark.sql.functions._
        val df = spark.range(1).select(lit("m").as("metric"),
          (col("id") * 1000).as("ts_ms"), lit(1.0).as("value"))
        val plan = graft.plans.GapFillOps.gapFill(df, 0L, 3000L, 1000L)
          .queryExecution.executedPlan.toString
        plan.contains("GapFillExec")
      })
  }
}
