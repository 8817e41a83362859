package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, SortOrder, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.DoubleType

/** Gap-fill as a first-class operator (builder brief preference (c): custom
  * `LogicalPlan` + `Strategy` + physical `SparkPlan`): densify each series
  * over [startMs, endMs) at stepMs, emitting the reference's empty points
  * (value NULL, confidence 0; `src/dqe_get.erl:54-60`) for missing slots.
  *
  * Why a physical operator instead of the spine-join formulation
  * (core/SeriesOps.gapFilled): the operator declares
  * requiredChildDistribution = clustered-by-series and
  * requiredChildOrdering = (metric, ts) — the planner inserts exactly one
  * shuffle+sort, and the fill itself is a streaming per-partition pass: no
  * spine materialization, no join, no broadcast. At 100 TB the spine
  * (timeframe × series) never exists; memory per task is one row template.
  *
  * Input contract: columns `metric` (series key) and `ts_ms` (slot-aligned
  * epoch millis) and `value`; rows outside the range or off-step are the
  * caller's responsibility to filter (the DQL compiler's leaves already
  * range-filter).
  */
final case class GapFill(child: LogicalPlan, startMs: Long, endMs: Long,
                         stepMs: Long,
                         // a constructor field so tree transforms (copy)
                         // preserve the attribute's exprId — a fresh id per
                         // copy would orphan downstream references
                         confidenceAttr: AttributeReference =
                           AttributeReference("confidence", DoubleType,
                             nullable = false)()) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ confidenceAttr
  // the attribute is produced here, not referenced from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(confidenceAttr)
  // the operator re-emits EVERY child column (missing-slot rows clone the
  // series key columns) — declare them referenced or ColumnPruning strips
  // the child down to whatever the parent projects
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(c: LogicalPlan): GapFill =
    copy(child = c)
}

final case class GapFillExec(child: SparkPlan, startMs: Long, endMs: Long,
                             stepMs: Long, output: Seq[Attribute])
    extends UnaryExecNode {

  // the trailing confidence attribute is produced here (same contract as
  // the logical node) — without this the node reads as invalid (`!`) and
  // AQE rejects the plan
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      output.filterNot(child.outputSet.contains))

  private def metricAttr = child.output.find(_.name == "metric").getOrElse(
    throw new IllegalArgumentException("GapFill input needs a 'metric' column"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(metricAttr)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val ts = child.output.find(_.name == "ts_ms").getOrElse(
      throw new IllegalArgumentException(
        s"GapFill input needs a 'ts_ms' column; child output: " +
          child.output.map(a => s"${a.name}#${a.exprId.id}").mkString(", ")))
    Seq(Seq(SortOrder(metricAttr, Ascending), SortOrder(ts, Ascending)))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val n = childOutput.length
    val metricIdx = childOutput.indexWhere(_.name == "metric")
    val tsIdx = childOutput.indexWhere(_.name == "ts_ms")
    val valueIdx = childOutput.indexWhere(_.name == "value")
    val types = childOutput.map(_.dataType)
    val (s0, s1, step) = (startMs, endMs, stepMs)

    val outAttrs = output
    child.execute().mapPartitions { rows0 =>
      // downstream operators (exchanges, sorts) require UnsafeRow
      val toUnsafe = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(outAttrs, outAttrs)
      val rows = rows0
      val filled: Iterator[InternalRow] = new Iterator[InternalRow] {
        private var template: InternalRow = _      // copied row of cur series
        private var curMetric: AnyRef = _
        private var nextSlot: Long = s1            // next slot to account for
        private var pendingObserved: InternalRow = _
        private val queue = scala.collection.mutable.Queue.empty[InternalRow]

        private def missingRow(slot: Long): InternalRow = {
          val vals = new Array[Any](n + 1)
          var i = 0
          while (i < n) { vals(i) = template.get(i, types(i)); i += 1 }
          vals(tsIdx) = slot
          vals(valueIdx) = null
          vals(n) = 0.0
          new GenericInternalRow(vals)
        }
        private def observedRow(r: InternalRow): InternalRow = {
          val vals = new Array[Any](n + 1)
          var i = 0
          while (i < n) { vals(i) = r.get(i, types(i)); i += 1 }
          vals(n) = 1.0
          new GenericInternalRow(vals)
        }
        private def flushSeriesTail(): Unit =
          while (nextSlot < s1) { queue += missingRow(nextSlot); nextSlot += step }

        private def pump(): Unit = {
          while (queue.isEmpty && (pendingObserved != null || rows.hasNext)) {
            val r = if (pendingObserved != null) {
              val t = pendingObserved; pendingObserved = null; t
            } else rows.next().copy()
            val m = r.get(metricIdx, types(metricIdx))
            if (curMetric == null || m != curMetric) {
              if (curMetric != null && nextSlot < s1) {
                // finish previous series before starting the new one
                pendingObserved = r
                flushSeriesTail()
                return
              }
              curMetric = m; template = r; nextSlot = s0
            }
            val ts = r.getLong(tsIdx)
            while (nextSlot < ts && nextSlot < s1) {
              queue += missingRow(nextSlot); nextSlot += step
            }
            if (ts >= s0 && ts < s1) {
              queue += observedRow(r)
              nextSlot = ts + step
            }
          }
          if (queue.isEmpty && curMetric != null && nextSlot < s1)
            flushSeriesTail()
        }

        def hasNext: Boolean = { if (queue.isEmpty) pump(); queue.nonEmpty }
        def next(): InternalRow = { if (queue.isEmpty) pump(); queue.dequeue() }
      }
      filled.map(toUnsafe)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): GapFillExec =
    copy(child = c)
}

object GapFillStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g @ GapFill(child, s, e, st, _) =>
      GapFillExec(planLater(child), s, e, st, g.output) :: Nil
    case _ => Nil
  }
}

/** User entry: installs the strategy on the session (runtime-injectable via
  * experimental strategies — works on any session, no withExtensions
  * needed) and wraps the frame in the logical node.
  */
object GapFillOps {
  def install(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(GapFillStrategy))
      spark.experimental.extraStrategies = strategies :+ GapFillStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(GapFillRangeRule))
      spark.experimental.extraOptimizations = opts :+ GapFillRangeRule
  }

  def gapFill(df: DataFrame, startMs: Long, endMs: Long,
              stepMs: Long): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    GraftBridge.ofRows(spark,
      GapFill(GraftBridge.logicalPlan(df), startMs, endMs, stepMs))
  }
}
