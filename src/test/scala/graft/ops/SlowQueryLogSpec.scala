package graft.ops

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Slow-query observability (reference src/dqe.erl:288-322): queries past
  * the threshold leave a .dot plan graph + .log debug file; fast queries
  * leave nothing.
  */
class SlowQueryLogSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = Files.createTempDirectory("graft-slowlog").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(SlowQueryLog.FolderConf, dir)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def files(): Set[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).toSet

  // QueryExecutionListener events are delivered asynchronously on the
  // listener bus — poll for the condition instead of reaching into the
  // private bus API
  private def eventually(cond: => Boolean, ms: Long = 10000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  test("a query past the threshold dumps a .dot graph and a .log") {
    val l = SlowQueryLog.register(spark)
    try {
      spark.conf.set(SlowQueryLog.SlowMsConf, "0") // everything is slow
      spark.range(100)
        .groupBy(org.apache.spark.sql.functions.expr("id % 10").as("k"))
        .count().collect()
      assert(eventually(files().exists(_.endsWith(".log"))), s"no dump in ${files()}")
      val fs = files()
      val log = fs.find(_.endsWith(".log"))
      val dot = fs.find(_.endsWith(".dot"))
      assert(log.isDefined && dot.isDefined, s"expected dumps, got $fs")
      val logText = Files.readString(Paths.get(dir, log.get))
      assert(logText.contains("duration_ms") &&
        logText.contains("== Physical Plan =="), logText.take(500))
      val dotText = Files.readString(Paths.get(dir, dot.get))
      assert(dotText.startsWith("digraph plan") &&
        dotText.contains("HashAggregate"), dotText.take(500))
    } finally spark.listenerManager.unregister(l)
  }

  test("a fast query under the threshold dumps nothing") {
    val l = SlowQueryLog.register(spark)
    try {
      spark.conf.set(SlowQueryLog.SlowMsConf, "600000") // nothing is slow
      val before = files()
      spark.range(10).collect()
      // absence can't be awaited on a signal: give the bus a beat to drain
      Thread.sleep(1500)
      assert(files() == before)
    } finally spark.listenerManager.unregister(l)
  }
}
