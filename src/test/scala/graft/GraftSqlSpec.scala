package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The SQL escape hatch: registered views expose the series model to plain
  * Spark SQL, so capabilities the reference lacks (SURVEY §2.10 — rollup,
  * window functions, joins) work on the same data without new code.
  */
class GraftSqlSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.registerViews(spark, "/root/testdata/sf0.001")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("rollup over the series view (absent in the reference, free here)") {
    val rows = spark.sql(
      """SELECT mtype, muser, COUNT(*) AS n
        |FROM graft_series GROUP BY ROLLUP(mtype, muser)""".stripMargin)
      .collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand.head.getLong(2) > 0)
  }

  test("window functions over the series view") {
    val rows = spark.sql(
      """SELECT metric, ts_ms, value,
        |  RANK() OVER (PARTITION BY metric ORDER BY value DESC) AS rk
        |FROM graft_series WHERE mtype = 'purchase'""".stripMargin)
      .where("rk = 1").collect()
    assert(rows.nonEmpty)
  }
}
