package graft.dql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Index sizing contract (r16 verdict #3): explicit conf pins win and
  * never touch the corpus; unset confs derive corpus-scaled defaults
  * (nCells = ⌈√n⌉, bits = ⌈log₂(n / BucketTarget)⌉ clamped to
  * [1, 24]) from one memoized count. Result-level sizing-invariance
  * of the exact dispatch is pinned separately by the
  * `dql_pipeline_simtopk_sized` oracle gate (nCells=5 ≡ brute).
  */
class DqlArtifactsSizingSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  /** fake store with a unique corpus key (the sizing memo is per
    * (session, corpusKey)) and a synthetic embeddings table of `n`
    * rows; `counted` observes whether sizing had to touch the corpus
    */
  private final class FakeStore(key: String, n: Long) extends SeriesStore {
    var counted = false
    override def corpusKey: String = key
    def resolutionMs(bucket: String): Long = 1000L
    def series(spark: SparkSession, bucket: String): DataFrame =
      throw new UnsupportedOperationException("series unused here")
    def tagCol(ns: String, k: String): Option[String] = None
    val tagCols: Seq[String] = Seq.empty
    def events(spark: SparkSession, bucket: String): DataFrame =
      throw new UnsupportedOperationException("events unused here")
    override def table(spark: SparkSession, name: String): DataFrame = {
      require(name == "embeddings", name)
      counted = true
      spark.range(n).toDF("vec_id")
    }
  }

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("conf pins win and the corpus is never counted") {
    val st = new FakeStore("sizing-pinned", 123456L)
    withConf("spark.graft.dql.sim.ncells" -> "8",
             "spark.graft.dql.sim.bits" -> "4") {
      assert(DqlArtifacts.nCells(spark, st) === 8)
      assert(DqlArtifacts.bits(spark, st) === 4)
      assert(!st.counted, "pinned sizing must not run a corpus count")
    }
  }

  test("unset confs corpus-scale: nCells = ceil(sqrt(n)), " +
    "bits = ceil(log2(n/64))") {
    val st = new FakeStore("sizing-auto-8192", 8192L)
    assert(DqlArtifacts.nCells(spark, st) === 91) // ceil(sqrt(8192))
    assert(DqlArtifacts.bits(spark, st) === 7)    // log2(8192/64)
    assert(st.counted)
    // n below one bucket target clamps bits to the floor of 1
    val small = new FakeStore("sizing-auto-17", 17L)
    assert(DqlArtifacts.nCells(spark, small) === 5) // ceil(4.12)
    assert(DqlArtifacts.bits(spark, small) === 1)
  }

  test("only the COUNT memoizes; conf pins read live, so a conf change " +
    "after the first lookup takes effect") {
    val st = new FakeStore("sizing-memo", 100L)
    DqlArtifacts.nCells(spark, st)
    st.counted = false
    DqlArtifacts.bits(spark, st)
    DqlArtifacts.nCells(spark, st)
    assert(!st.counted, "second lookup must hit the count memo")
    // the conf-flip hazard class (same as the streaming CompileOpts
    // fix): setting a pin AFTER auto-sized lookups must win, and
    // unsetting it must fall back to the auto sizing
    withConf("spark.graft.dql.sim.ncells" -> "32") {
      assert(DqlArtifacts.nCells(spark, st) === 32)
    }
    assert(DqlArtifacts.nCells(spark, st) === 10) // ceil(sqrt(100))
    assert(!st.counted, "conf flips must not re-count the corpus")
  }

  test("malformed or non-positive conf values are typed errors") {
    val st = new FakeStore("sizing-bad", 10L)
    withConf("spark.graft.dql.sim.ncells" -> "0") {
      val e = intercept[IllegalArgumentException](
        DqlArtifacts.nCells(spark, st))
      assert(e.getMessage.contains("spark.graft.dql.sim.ncells"))
    }
    withConf("spark.graft.dql.sim.bits" -> "four") {
      val e = intercept[IllegalArgumentException](
        DqlArtifacts.bits(spark, new FakeStore("sizing-bad2", 10L)))
      assert(e.getMessage.contains("spark.graft.dql.sim.bits"))
    }
  }
}
