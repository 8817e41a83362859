package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Generated-class reuse across streaming queries (r18 find): Spark 4
  * keys the codegen cache by (context classloader, source), and session
  * ARTIFACT ISOLATION (default on) hands each streaming query's cloned
  * session a fresh isolated classloader — so two runs of the SAME stream
  * plan Janino-compiled twice ("scope drift": identical bodies under new
  * ExecutorClassLoaders, measured 17 units/run on the stream_avg gate).
  * Harness sessions disable isolation (they are single-tenant and add no
  * session artifacts); this pins the contract that a re-run of an
  * identical streaming plan compiles NOTHING new on such a session.
  */
class CodegenReuseSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def janinoCount: Long =
    org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount

  private def runOnce(n: Int): Unit = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cgreuse").toString
    val s = spark
    import s.implicits._
    (0 until 20).map(i => (i.toLong, i % 3)).toDF("v", "k")
      .withColumn("ts", timestamp_millis(col("v") * 1000))
      .write.mode("overwrite").parquet(s"$dir/in")
    val sch = s.read.parquet(s"$dir/in").schema
    val q = s.readStream.schema(sch).parquet(s"$dir/in")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("k"), window(col("ts"), "5 seconds"))
      .agg(sum(col("v")).as("sv"))
      .writeStream.format("memory").queryName(s"cg_reuse_$n")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    q.awaitTermination(); q.stop()
  }

  test("an identical streaming plan re-run compiles zero new generated " +
    "classes on an isolation-free session") {
    runOnce(1) // first run: honest cold compile
    val c0 = janinoCount
    runOnce(2) // identical plan, new streaming query + cloned session
    assert(janinoCount == c0,
      "re-running an identical stream plan must hit the codegen cache " +
        "(scope drift means artifact isolation re-entered the session)")
  }
}
