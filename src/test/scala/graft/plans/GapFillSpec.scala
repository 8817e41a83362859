package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The physical gap-fill operator must agree exactly with the spine-join
  * formulation on real data (restricted to series present in range — the
  * operator can only densify series it sees), and its plan must show the
  * declared distribution/ordering driving one shuffle+sort, with no join.
  */
class GapFillSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"
  private val D5 = 1704412800000L
  private val D6 = 1704499200000L

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def base = graft.core.SeriesOps.series(spark, dir)
    .where(col("mtype") === "purchase" &&
      col("ts_ms") >= D5 && col("ts_ms") < D6)

  test("native operator matches the spine-join gap-fill exactly") {
    val native = GapFillOps.gapFill(base, D5, D6, 1000L)
      .select("metric", "ts_ms", "value", "confidence")
    // spine version densifies every cataloged series; restrict it to the
    // series actually present in range for apples-to-apples
    val present = base.select("metric").distinct()
    val spine = graft.core.SeriesOps
      .gapFilled(spark, dir, D5, D6, Some("purchase"))
      .join(present, Seq("metric"), "left_semi")
      .select("metric", "ts_ms", "value", "confidence")
    val a = native.orderBy("metric", "ts_ms").collect()
    val b = spine.orderBy("metric", "ts_ms").collect()
    assert(a.length == b.length && a.nonEmpty)
    assert(a.sameElements(b))
    // and the dense frame really is dense: 86400 slots per series
    val perSeries = native.groupBy("metric").count().collect()
    assert(perSeries.forall(_.getLong(1) == 86400L))
  }

  test("range rule: a time filter narrows the operator's generation bounds") {
    val hourEnd = D5 + 3600000L
    val wide = GapFillOps.gapFill(base, D5, D6, 1000L)
      .where(col("ts_ms") >= D5 && col("ts_ms") < hourEnd)
    // the optimized plan's GapFill carries the narrowed bounds
    val opt = wide.queryExecution.optimizedPlan.toString
    assert(opt.contains(s"GapFill") && opt.contains(hourEnd.toString),
      s"expected narrowed endMs in:\n$opt")
    // row count = one hour of slots per series present in range
    val nSeries = base.select("metric").distinct().count()
    assert(wide.count() == 3600L * nSeries)
    // identical rows to the spine-join gap-fill of the hour over the same
    // catalog (series present in the DAY — a series with no points in the
    // hour still gets its all-empty hour, exactly as the unoptimized
    // wide-then-filter plan produces)
    val present = base.select("metric").distinct()
    val direct = graft.core.SeriesOps
      .gapFilled(spark, dir, D5, hourEnd, Some("purchase"))
      .join(present, Seq("metric"), "left_semi")
      .select("metric", "ts_ms", "value", "confidence")
      .orderBy("metric", "ts_ms").collect()
    val filtered = wide.select("metric", "ts_ms", "value", "confidence")
      .orderBy("metric", "ts_ms").collect()
    assert(filtered.sameElements(direct))
  }

  test("plan shape: one exchange+sort feeding the operator, no join") {
    val df = GapFillOps.gapFill(base, D5, D6, 1000L)
    // SparkPlan.nodeName strips the Exec suffix: the exec renders as
    // "GapFill <startMs>, ..." — visible pre-preparation in sparkPlan
    val pre = df.queryExecution.sparkPlan.toString()
    assert(pre.contains(s"GapFill $D5"), pre.take(1500))
    assert(!pre.contains("Join"), "gap-fill should not plan a join")
    // the required child ordering materializes as a Sort only after
    // EnsureRequirements (executedPlan preparations / AQE finalization)
    df.count()
    val fin = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString()
      case p => p.toString()
    }
    assert(fin.contains("Sort"), "missing required child ordering:\n" + fin.take(1500))
    assert(!fin.contains("Join"), "gap-fill should not execute a join")
  }

  test("aggregating the native dense frame gives the oracle-verified counts") {
    val dense = GapFillOps.gapFill(base, D5, D6, 1000L)
    val counts = dense
      .groupBy(col("metric"))
      .agg(count(when(col("confidence") > 0.5, 1)).as("present"))
      .collect().map(r => r.getLong(1)).sum
    assert(counts == base.count())
  }
}
