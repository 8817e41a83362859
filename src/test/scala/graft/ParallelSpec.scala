package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** [[graft.core.Parallel.widen]]: repartitions a narrow exchange-free
  * plan to the default parallelism, is a no-op on already-wide input,
  * and refuses to touch (or physically probe) a plan containing an
  * exchange or a subquery — the df.rdd split probe would execute those
  * upstream stages under AQE.
  */
class ParallelSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("narrow exchange-free plan is widened to default parallelism") {
    val df = spark.range(0, 100, 1, numPartitions = 1).toDF("id")
      .where(col("id") % 2 === 0)
    val w = graft.core.Parallel.widen(df)
    assert(w.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(w.count() == 50)
  }

  test("already-wide plan passes through without a repartition") {
    val df = spark.range(0, 100, 1,
      numPartitions = spark.sparkContext.defaultParallelism + 2).toDF("id")
    val w = graft.core.Parallel.widen(df)
    // no round-robin exchange inserted: same plan object
    assert(w eq df)
  }

  test("plan with an upstream exchange is returned unchanged") {
    val df = spark.range(0, 100, 1, numPartitions = 1).toDF("id")
      .groupBy(col("id") % 10).count()
    val w = graft.core.Parallel.widen(df)
    assert(w eq df)
  }

  test("plan with a subquery is returned unchanged") {
    spark.range(0, 10).toDF("id").createOrReplaceTempView("par_sub_t")
    val df = spark.sql(
      "SELECT id FROM par_sub_t WHERE id > (SELECT avg(id) FROM par_sub_t)")
    val w = graft.core.Parallel.widen(df)
    assert(w eq df)
  }
}
