package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The native kernel must agree with the composed higher-order form on
  * every input (interpreted eval AND whole-stage codegen paths), and its
  * rounding with BigDecimal HALF_UP.
  */
class FixedPointDotSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("matches zip_with+aggregate composition on random float vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = spark.createDataFrame(rows).toDF("id", "a", "b")
    val composed = aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => round(x.cast("double") * y.cast("double") * 1e15, 0).cast("long")),
      lit(0L), (acc, t) => acc + t)
    val diff = df.select(
        FixedPointDot(col("a"), col("b"), 1e15).as("native"),
        composed.as("composed"))
      .where(col("native") =!= col("composed"))
    assert(diff.count() == 0)
  }

  test("rounding is half-away-from-zero incl. the x+0.5 misround trap") {
    assert(FixedPointDot.roundHalfAway(2.5) == 3L)
    assert(FixedPointDot.roundHalfAway(-2.5) == -3L)
    assert(FixedPointDot.roundHalfAway(0.49999999999999994) == 0L)
    assert(FixedPointDot.roundHalfAway(-0.49999999999999994) == 0L)
    // agreement with BigDecimal HALF_UP on awkward doubles
    val rnd = new scala.util.Random(11)
    (1 to 10000).foreach { _ =>
      val v = (rnd.nextDouble() - 0.5) * 1e6
      val bd = BigDecimal(v)
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
      assert(FixedPointDot.roundHalfAway(v) == bd, s"v=$v")
    }
  }

  test("a mistyped argument fails at analysis, not as an executor " +
    "ClassCastException mid-job") {
    // graft_dot is a REGISTERED session function (GraftExtensions), so
    // arbitrary SQL reaches this expression; r18 added the input type
    // check after review found `graft_dot(array(1.0D), 2)` resolved fine
    // and then cast-crashed inside a task
    val s = spark
    import s.implicits._
    val e = intercept[Exception](
      Seq((Array(1.0), 2)).toDF("a", "x")
        .select(FixedPointDot(col("a"), col("x"), 100.0)).collect())
    assert(e.getMessage.contains("graft_dot") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
