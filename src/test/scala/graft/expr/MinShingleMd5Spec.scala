package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The native fingerprint kernel must be value-identical to the composed
  * higher-order formulation on real corpus data, and NULL below the
  * shingle length.
  */
class MinShingleMd5Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("kernel equals the composed transform/array_min form on the corpus") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val both = docs.select(
      MinShingleMd5(col("text"), 8).as("native"),
      expr("array_min(transform(sequence(1, length(text)-7)," +
        " i -> md5(substr(text, i, 8))))").as("composed"))
    assert(both.where(col("native") =!= col("composed")).count() == 0)
    assert(both.where(col("native").isNull).count() == 0)
  }

  test("short and edge inputs") {
    val s = spark
    import s.implicits._
    val df = Seq("", "1234567", "12345678", "123456789")
      .toDF("text").select(col("text"),
        MinShingleMd5(col("text"), 8).as("fp"))
    val rows = df.collect().map(r =>
      (r.getString(0), Option(r.getString(1)))).toMap
    assert(rows("").isEmpty && rows("1234567").isEmpty)
    assert(rows("12345678").nonEmpty)
    // 9 chars → min of two digests; spot-check against java MD5
    val md = java.security.MessageDigest.getInstance("MD5")
    val h1 = md.digest("12345678".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h2 = java.security.MessageDigest.getInstance("MD5")
      .digest("23456789".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows("123456789").get == Seq(h1, h2).min)
  }

  test("multibyte text slices by chars, not bytes") {
    val s = spark
    import s.implicits._
    val text = "αβγδεζηθικ" // 10 two-byte chars
    val df = Seq(text).toDF("text").select(
      MinShingleMd5(col("text"), 8).as("native"),
      expr("array_min(transform(sequence(1, length(text)-7)," +
        " i -> md5(substr(text, i, 8))))").as("composed"))
    val r = df.collect().head
    assert(r.getString(0) == r.getString(1))
  }

  test("mixed-width text: the sliding byte-window path equals the " +
    "composed form at every shingle position") {
    // r18: the non-ASCII path became an O(n) sliding byte-offset window
    // (substringSQL re-walked from position 0 per shingle — O(n²) on CJK
    // rows). Mixed 1/2/3/4-byte chars exercise every window-advance
    // width; both substr and the window count CODE POINTS (UTF8String
    // chars), so a 4-byte char is one position on both sides — pinned.
    val s = spark
    import s.implicits._
    val text = "abé中xß龥cdà二yz" * 3
    for (len <- Seq(2, 5, 8)) {
      val df = Seq(text).toDF("text").select(
        MinShingleMd5(col("text"), len).as("native"),
        expr(s"array_min(transform(sequence(1, length(text)-${len - 1})," +
          s" i -> md5(substr(text, i, $len))))").as("composed"))
      val r = df.collect().head
      assert(r.getString(0) == r.getString(1), s"len=$len")
    }
  }

  test("plan-time validation: non-positive shingle length and mistyped " +
    "argument both fail before any executor work") {
    intercept[IllegalArgumentException](MinShingleMd5(col("text"), 0))
    intercept[IllegalArgumentException](MinShingleMd5(col("text"), -1))
    val s = spark
    import s.implicits._
    val e = intercept[Exception](
      Seq(1).toDF("x").select(MinShingleMd5(col("x"), 8)).collect())
    assert(e.getMessage.contains("graft_fingerprint") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
