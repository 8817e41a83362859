package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: a time-range `Filter` directly above a [[GapFill]]
  * narrows the operator's densification bounds — the generated spine
  * shrinks to the queried window, so a `LAST 1 h` filter over a
  * year-configured gap-fill generates an hour of slots, not a year
  * (the custom-operator analog of partition pruning; the reference
  * computes the same bound at plan time, `src/dql_resolution.erl:131-135`).
  *
  * The filter itself is KEPT (only the generation range changes): GapFill
  * passes child rows through, so the predicate still bounds any child rows
  * outside the narrowed range — the rewrite is therefore always
  * semantics-preserving, and re-application converges (same bounds →
  * identical tree → fixed point).
  *
  * New start is snapped UP onto the original slot grid so emitted slot
  * timestamps are unchanged.
  */
object GapFillRangeRule extends Rule[LogicalPlan] with PredicateHelper {

  private def asMs(l: Literal): Option[Long] = l match {
    case Literal(v: Long, LongType)   => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _                            => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, g: GapFill) =>
      g.child.output.find(_.name == "ts_ms") match {
        case None => f
        case Some(ts) =>
          var lo = g.startMs
          var hi = g.endMs
          def isTs(e: Expression): Boolean = e match {
            case a: AttributeReference => a.semanticEquals(ts)
            case _                     => false
          }
          splitConjunctivePredicates(cond).foreach {
            case GreaterThanOrEqual(a, l: Literal) if isTs(a) =>
              asMs(l).foreach(v => lo = math.max(lo, v))
            case GreaterThan(a, l: Literal) if isTs(a) =>
              asMs(l).foreach(v => lo = math.max(lo, v + 1))
            case LessThan(a, l: Literal) if isTs(a) =>
              asMs(l).foreach(v => hi = math.min(hi, v))
            case LessThanOrEqual(a, l: Literal) if isTs(a) =>
              asMs(l).foreach(v => hi = math.min(hi, v + 1))
            // flipped literal-first forms
            case LessThanOrEqual(l: Literal, a) if isTs(a) =>
              asMs(l).foreach(v => lo = math.max(lo, v))
            case LessThan(l: Literal, a) if isTs(a) =>
              asMs(l).foreach(v => lo = math.max(lo, v + 1))
            case GreaterThan(l: Literal, a) if isTs(a) =>
              asMs(l).foreach(v => hi = math.min(hi, v))
            case GreaterThanOrEqual(l: Literal, a) if isTs(a) =>
              asMs(l).foreach(v => hi = math.min(hi, v + 1))
            case _ => ()
          }
          if (lo > g.startMs) { // snap UP onto the original slot grid
            val k = (lo - g.startMs + g.stepMs - 1) / g.stepMs
            lo = g.startMs + k * g.stepMs
          }
          if (lo != g.startMs || hi != g.endMs)
            Filter(cond, g.copy(startMs = lo, endMs = math.max(lo, hi)))
          else f
      }
  }
}
