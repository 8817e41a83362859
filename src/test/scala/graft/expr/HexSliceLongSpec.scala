package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The native hex-slice parse must be indistinguishable from the
  * `conv(substring(...), 16, 10)` form it replaced in the minhash
  * signature — fuzzed over md5 output (its real input) and checked at
  * every channel offset.
  */
class HexSliceLongSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("equals conv(substring, 16, 10) over md5 hex at every channel " +
    "offset, codegen and interpreted") {
    val s = spark
    import s.implicits._
    val df = (0 until 500).map(i => s"payload-$i").toDF("t")
      .select(md5(col("t")).as("h"))
    for (c <- 0 until 4) {
      val native = org.apache.spark.sql.GraftBridge.column(
        HexSliceLong(org.apache.spark.sql.GraftBridge
          .expression(col("h")), c * 8, 8))
      val mismatch = df.select(native.as("a"),
          conv(substring(col("h"), c * 8 + 1, 8), 16, 10)
            .cast("long").as("b"))
        .where(col("a") =!= col("b")).count()
      assert(mismatch == 0L, s"channel $c")
    }
    // interpreted path agrees with codegen (nullSafeEval vs static call)
    val u = org.apache.spark.unsafe.types.UTF8String
      .fromString("00ffAa9c deadbeef")
    assert(HexSliceLong.compute(u, 0, 8) == 0xffaa9cL)
    assert(HexSliceLong.compute(u, 9, 8) == 0xdeadbeefL)
    // non-hex char stops the parse (conv's prefix semantics)
    assert(HexSliceLong.compute(u, 6, 8) == 0x9cL)
    // slice past the end is clamped
    assert(HexSliceLong.compute(u, 15, 8) == 0xefL)
  }
}
