package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** DSIR importance resampling: the hashed-unigram importance weights
  * must pull docs toward the target distribution, the ratio table must
  * cover every bucket (smoothed), selection must be a capped
  * deterministic top-k, and scoring must stay row-local (no corpus
  * shuffle).
  */
class DsirSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpus = {
    val s = spark
    import s.implicits._
    // docs 0-3: target dialect; docs 10-13: source-only dialect;
    // doc 20: mixed
    Seq(
      (0L, "alpha beta gamma alpha"), (1L, "beta gamma alpha beta"),
      (2L, "gamma alpha beta gamma"), (3L, "alpha beta beta gamma"),
      (10L, "omega sigma tau omega"), (11L, "sigma tau omega sigma"),
      (12L, "tau omega sigma tau"), (13L, "omega tau tau sigma"),
      (20L, "alpha omega beta sigma"))
      .toDF("doc_id", "text")
  }

  test("target-dialect docs outweigh source-only docs; mixed sits between") {
    val rs = Dsir.ratioRow(Dsir.logRatios(corpus, 32, col("doc_id") < 10))
    val w = Dsir.score(corpus, rs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(0) > w(20), s"pure target ${w(0)} !> mixed ${w(20)}")
    assert(w(20) > w(10), s"mixed ${w(20)} !> pure source ${w(10)}")
    assert(w(0) > 0.0 && w(10) < 0.0)
  }

  test("ratio table: one row per bucket, smoothing floors empty buckets," +
    " no NaN/null") {
    val rows = Dsir.logRatios(corpus, 32, col("doc_id") < 10).collect()
    assert(rows.length == 32)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L until 32L))
    assert(rows.forall(r => !r.isNullAt(1) && !r.getDouble(1).isNaN &&
      !r.getDouble(1).isInfinite))
  }

  test("selection: exactly k rows, keys descending, deterministic reruns") {
    val a = Dsir.select(corpus, 32, col("doc_id") < 10, k = 4).collect()
    val b = Dsir.select(corpus, 32, col("doc_id") < 10, k = 4).collect()
    assert(a.length == 4)
    val keys = a.map(_.getDouble(2)).toSeq
    assert(keys == keys.sorted.reverse)
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
  }

  test("scoring shuffles nothing; selection caps via TakeOrdered") {
    // freeze the (dim-bounded) ratio artifact so the plan under test is
    // the corpus-scoring side alone — the production posture, where the
    // ratio table is batch-refreshed and broadcast
    val rs = Dsir.ratioRow(Dsir.logRatios(corpus, 32, col("doc_id") < 10))
      .persist()
    rs.count()
    // structural walks must unwrap the AQE root — collect() does not
    // descend into AdaptiveSparkPlanExec's inner plan
    def nodes(df: org.apache.spark.sql.DataFrame)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val root = df.queryExecution.executedPlan
      val inner = root match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      inner.collect { case p => p }
    }
    // the corpus side of score() must not hash-exchange: only the
    // one-row ratio frame moves (as a broadcast). Structural walk — the
    // plan STRING would also show the cached ratio lineage inside the
    // InMemoryRelation, which the query does not execute.
    val shuffles = nodes(Dsir.score(corpus, rs)).collect {
      case e: org.apache.spark.sql.execution.exchange
        .ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, shuffles.mkString("\n"))
    // a threshold on the computed key must stay ABOVE the broadcast
    // nested-loop join: pushed into the join condition it would evaluate
    // the md5-heavy fold interpreted, per row, twice (measured ~30× at
    // sf0.1 before the generator barrier)
    val joins = nodes(Dsir.score(corpus, rs).where(col("key") > 2.0))
      .collect { case j: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => j }
    assert(joins.nonEmpty, "expected the broadcast ratio cross join")
    assert(joins.forall(_.condition.isEmpty),
      joins.map(_.condition).mkString("\n"))
    rs.unpersist()
    val selPlan = Dsir.select(corpus, 32, col("doc_id") < 10, k = 4)
      .queryExecution.executedPlan.toString
    assert(selPlan.contains("TakeOrderedAndProject"), selPlan)
  }
}
