package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Stream-static as-of: the packed-index probe must equal the batch
  * union+window sweep on the same frames — inclusive boundary, per-key
  * isolation, NULL when nothing precedes — and must execute with zero
  * stateful operators (replay order cannot matter).
  */
class AsofStreamSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("packed probe ≡ batch as-of sweep; stateless execution") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val right = Seq((1L, 60L, 6.5), (1L, 200L, 7.5), (2L, 150L, 9.9))
      .toDF("k", "ts_ms", "value")
    val leftRows = Seq((1L, 50L, 5.0), (1L, 100L, 10.0), (1L, 200L, 20.0),
      (2L, 100L, 1.0))
    val idx = AsofStream.packed(right, Seq("k"), "ts_ms", "value")

    val in = MemoryStream[(Long, Long, Double)]
    val left = in.toDF().toDF("k", "ts_ms", "value")
    val out = AsofStream.asof(left, idx, Seq("k"), "ts_ms", "rv")
    val q = out.writeStream.format("memory").queryName("sasof")
      .outputMode("append").start()
    // two batches in scrambled order — statelessness makes order moot
    in.addData(leftRows(2), leftRows(0))
    q.processAllAvailable()
    in.addData(leftRows(1), leftRows(3))
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.isEmpty, "must be stateless")
    val got = spark.sql("SELECT k, ts_ms, rv FROM sasof ORDER BY k, ts_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    q.stop()
    val batch = graft.operators.AsofJoin.asof(
      leftRows.toDF("k", "ts_ms", "value"), right, Seq("k"), "ts_ms",
      "value", "rv").orderBy("k", "ts_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == batch)
    assert(got == Seq((1L, 50L, None), (1L, 100L, Some(6.5)),
      (1L, 200L, Some(7.5)), (2L, 100L, None)))
  }
}
