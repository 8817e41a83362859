package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The CollapseProject blow-up lint over the ENTIRE registered query
  * surface: every SparkEntry gate's returned frame is audited for the
  * per-element re-evaluation class at sf0.001. Construction may execute
  * driver-side training (classifier rounds, Lloyd, BPE merges, PCA
  * steps) — that cost is the price of auditing the real shipped plans
  * rather than a curated sample; the tiny SF keeps it bounded.
  */
class FullSurfaceAuditSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("no registered gate's optimized plan carries the per-element " +
    "re-evaluation signature") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    // gates allowed to carry a SortAggregate, each with the reason it is
    // NOT the demotion class (sort is inherent, not a buffer-type
    // accident) — additions here need the same justification
    val sortAggAllowed: Map[String, String] = Map.empty
    // gates allowed a small-sided SortMergeJoin, each naming why the
    // shuffle is right anyway (same contract as sortAggAllowed)
    val smallJoinAllowed: Map[String, String] = Map.empty
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        val df = q(spark, dir)
        val findings = PlanAudit.lambdaInvariants(df)
        if (findings.nonEmpty)
          bad += s"$name:\n  ${findings.mkString("\n  ")}"
        val demotions = PlanAudit.sortAggDemotions(df)
        if (demotions.nonEmpty && !sortAggAllowed.contains(name))
          bad += s"$name (SortAggregate demotion — a non-mutable agg " +
            s"buffer forced a sort where HashAggregate+map-side combine " +
            s"was available):\n  ${demotions.mkString("\n  ")}"
        // a SortMergeJoin with a buildable side under the broadcast
        // threshold is a both-sides shuffle bought for nothing at
        // 100 TB (full-outer sides are exempt inside the lint — Spark
        // cannot broadcast them)
        val smallJoins = PlanAudit.unbroadcastSmallJoins(df)
        if (smallJoins.nonEmpty && !smallJoinAllowed.contains(name))
          bad += s"$name (non-broadcast small-side join):\n  " +
            smallJoins.mkString("\n  ")
        // an unblocked CartesianProduct anywhere in a shipped plan is a
        // corpus² scan at 100 TB — PlanSpec covers the pairwise family,
        // this covers EVERY registered gate (cached build subtrees
        // included: their provisioning pays the same quadratic bill)
        if (df.queryExecution.executedPlan.toString()
            .contains("CartesianProduct"))
          bad += s"$name: CartesianProduct in the physical plan"
      } catch {
        // a gate whose construction fails here is a separate defect —
        // surface it, but attribute it correctly
        case e: Throwable =>
          errs += s"$name: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(160)}"
      }
      graft.core.Caches.releaseTransient(spark)
    }
    assert(errs.isEmpty, s"gates failed to construct:\n${errs.mkString("\n")}")
    assert(bad.isEmpty,
      s"blow-up signature in ${bad.length} gate(s):\n${bad.mkString("\n")}")
  }
}
