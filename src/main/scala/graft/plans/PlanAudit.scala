package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._

/** Static lint for the CollapseProject blow-up class — the engine's
  * recurring failure mode (three incidents through r14, the worst
  * turning a 0.45 s scan into 136 s): a multiply-referenced array
  * derivation gets inlined by the optimizer into every consumer, and
  * when a consumer is a per-element lambda the O(n) derivation
  * re-evaluates PER ELEMENT — O(n²) per row, invisible until a timed
  * bench runs. The fix is always the generator barrier
  * (`explode(array(struct(...)))`); this audit makes the DETECTION
  * static, so `sbt test` catches a dropped barrier instead of the
  * bench wall.
  *
  * Two findings, both over the OPTIMIZED logical plan (after
  * CollapseProject has done whatever inlining it will do):
  *
  *   - [[lambdaInvariants]] — an expensive subtree inside a lambda body
  *     that references NO lambda variable: it re-evaluates once per
  *     element for a value that is constant across the loop. This is
  *     the quadratic class, and the HARD gate: runtime common-
  *     subexpression elimination cannot hoist it (EquivalentExpressions
  *     deliberately skips lambda bodies — a hoisted value could not be
  *     threaded into the loop).
  *   - [[duplicatedExpensive]] (advisory) — the same expensive subtree
  *     appearing more than once within a single plan node's expression
  *     list. Counted per node, not per plan — deriving a table twice in
  *     SEPARATE scans is a sanctioned pattern (the span dedup ladder
  *     recomputes occurrences by design).
  *
  * Note the inlining that plants these signatures mostly happens at
  * CONSTRUCTION time (a derivation held as a Scala `Column` val and
  * spliced into several consumers — Spark 4's CollapseProject itself
  * declines to inline multiply-referenced non-cheap projections). The
  * audit runs on the optimized plan, so it sees the end state no matter
  * which layer inlined.
  *
  * "Expensive" = the subtree contains a higher-order function or a
  * cryptographic/murmur hash — the derivations this engine actually
  * re-buys in its incidents (sorted bucket arrays, gram-hash
  * transforms, run-length scaffolds). Plain column refs, literals, and
  * scalar arithmetic never flag, so ordinary lambdas stay clean.
  */
object PlanAudit {

  private def isExpensive(e: Expression): Boolean = e.exists {
    case _: HigherOrderFunction => true
    case _: Md5 | _: Sha1 | _: Sha2 | _: Crc32 => true
    case _: Murmur3Hash | _: XxHash64 => true
    case _ => false
  }

  private def describe(e: Expression): String = {
    val s = e.toString
    if (s.length <= 160) s else s.take(160) + "…"
  }

  /** Loop-invariant expensive subtrees inside lambda bodies — each
    * finding is a derivation the plan re-evaluates once PER ARRAY
    * ELEMENT for a per-row-constant value. Empty on a healthy plan.
    *
    * Invariance is relative to the ENCLOSING lambdas' bound variables:
    * a subtree whose only lambda variables are bound by its own nested
    * lambdas (e.g. a spliced `array_sort(transform(...))` derivation)
    * is invariant across the enclosing loop and flags; a subtree that
    * reads the enclosing element variable does not.
    */
  def lambdaInvariants(df: DataFrame): Seq[String] = {
    val out = Seq.newBuilder[String]
    df.queryExecution.optimizedPlan.foreach { node =>
      def lambdaRefs(e: Expression): Set[Long] = {
        val b = Set.newBuilder[Long]
        e.foreach {
          case v: NamedLambdaVariable => b += v.exprId.id
          case _ => ()
        }
        b.result()
      }
      // maximal findings: once a subtree flags, don't descend into it
      def walk(e: Expression, bound: Set[Long]): Unit =
        if (bound.nonEmpty && isExpensive(e) &&
          lambdaRefs(e).intersect(bound).isEmpty) {
          out += s"${node.nodeName}: per-element re-eval of " + describe(e)
        } else e match {
          case LambdaFunction(body, args, _) =>
            walk(body, bound ++
              args.collect { case v: NamedLambdaVariable => v.exprId.id })
          case _ => e.children.foreach(walk(_, bound))
        }
      node.expressions.foreach(walk(_, Set.empty))
    }
    out.result()
  }

  /** ADVISORY: expensive subtrees duplicated within ONE plan node's
    * expression list (canonicalized; nested hits under distinct outer
    * wrappers still count). Duplicates at this level are usually
    * recovered at runtime by common-subexpression elimination
    * (`EquivalentExpressions` hoists them once per row in both codegen
    * and interpreted projections) — but CSE explicitly SKIPS lambda
    * bodies, which is why [[lambdaInvariants]] is the hard gate and
    * this one is informational.
    */
  def duplicatedExpensive(df: DataFrame): Seq[String] = {
    val out = Seq.newBuilder[String]
    df.queryExecution.optimizedPlan.foreach { node =>
      val counts =
        scala.collection.mutable.LinkedHashMap[Expression, (Int, Expression)]()
      def scan(e: Expression): Unit =
        if (isExpensive(e) && e.isInstanceOf[HigherOrderFunction]) {
          val k = e.canonicalized
          val (c, first) = counts.getOrElse(k, (0, e))
          counts(k) = (c + 1, first)
          // still descend: an inner duplicated derivation hides under
          // distinct outer wrappers
          e.children.foreach(scan)
        } else e.children.foreach(scan)
      node.expressions.foreach(scan)
      counts.foreach { case (_, (c, first)) =>
        if (c > 1)
          out += s"${node.nodeName}: $c copies of " + describe(first)
      }
    }
    out.result()
  }

  /** SortAggregate-demotion probe (the r15 keep-first lesson: a
    * `min(struct(doc_id, pos))` silently demoted the whole corpus
    * aggregation from HashAggregate-with-map-side-combine to a
    * corpus-wide SortAggregate, because struct is not a mutable
    * agg-buffer type — caught only by a manual plan read). Spark picks
    * HashAggregate whenever every aggregation-buffer field is
    * UnsafeRow-mutable and falls back to SortAggregate otherwise, so at
    * the default confs a SortAggregate in a shipped plan IS the
    * demotion signature: some buffer field (struct/array/string) forced
    * the sort. Reports each SortAggregate line of the physical plan
    * with its aggregate functions; the full-surface spec asserts the
    * set stays empty (or explicitly whitelisted, naming the reason).
    * Text-scan rather than a tree collect because AdaptiveSparkPlanExec
    * hides its input plan from `collect`.
    */
  def sortAggDemotions(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.toString().linesIterator
      .filter(_.contains("SortAggregate"))
      .map { l =>
        val fns = l.indexOf("functions=[")
        if (fns >= 0) "SortAggregate " +
          l.substring(fns, math.min(l.length, fns + 120))
        else l.trim.take(120)
      }
      .toSeq.distinct

  /** Non-broadcast small-side join probe (r16 verdict #8 — the one
    * anti-pattern class of the brief not statically covered until
    * now): a SortMergeJoin whose BUILDABLE side's estimated stats sit
    * at or below the broadcast threshold is a shuffle of BOTH sides
    * where a broadcast of the small one was available — at 100 TB
    * that is a full-corpus exchange bought for nothing. Only sides
    * the join type can actually build flag (inner/cross: either;
    * left outer/semi/anti: right only; right outer: left only; full
    * outer: none — Spark cannot broadcast a full-outer side, so a
    * small-sided full-outer merge is the correct plan, not a
    * finding). Joins the planner COULD broadcast and didn't usually
    * mean a stats misestimate upstream or an explicit no-broadcast
    * hint; either deserves a look. A SortMergeJoin with NO exchange
    * beneath it moves no data at all (bucketed/co-located layout —
    * the tpch_q12_colocated posture) and is exempt: broadcasting
    * there would ADD a build with no shuffle saved. Probed on the
    * pre-AQE physical plan (AQE may rescue some at runtime, but the
    * static plan is what ships to an arbitrary cluster), side sizes
    * from each child's logical-link stats. Reads the PREPARED plan
    * (post-EnsureRequirements, AQE initial plan) — `sparkPlan` would
    * predate the exchanges the exemption tests for.
    */
  def unbroadcastSmallJoins(df: DataFrame): Seq[String] = {
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (thr <= 0) return Seq.empty // broadcasting disabled deliberately
    val out = Seq.newBuilder[String]
    // exchanges/sorts inserted by EnsureRequirements carry no logical
    // link — the side's size estimate lives on the topmost descendant
    // that still points at a logical node
    def sizeOf(p: org.apache.spark.sql.execution.SparkPlan): BigInt =
      p.collectFirst {
        case q if q.logicalLink.isDefined =>
          q.logicalLink.get.stats.sizeInBytes
      }.getOrElse(BigInt(-1))
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          import org.apache.spark.sql.catalyst.plans._
          val (l, r) = (sizeOf(j.left), sizeOf(j.right))
          val buildable: Seq[(String, BigInt)] = j.joinType match {
            case Inner | Cross => Seq("left" -> l, "right" -> r)
            case LeftOuter | LeftSemi | LeftAnti | _: ExistenceJoin =>
              Seq("right" -> r)
            case RightOuter => Seq("left" -> l)
            case _ => Seq.empty // full outer: no broadcastable side
          }
          val small = buildable.filter { case (_, s) => s >= 0 && s <= thr }
          // co-located (bucketed) joins shuffle nothing — a broadcast
          // would add a build cost and save no exchange. Only an
          // exchange ON A CHILD'S SPINE (above any operator that
          // establishes its own partitioning) counts against the
          // exemption: a shuffle deep in the subtree that exists for
          // an aggregation or another join is paid under EITHER join
          // strategy, so it says nothing about this join's cost —
          // flagging it would fail e.g. a bucketed side joined to a
          // groupBy output whose partitioning the join reuses.
          def spineHasExchange(
              p: org.apache.spark.sql.execution.SparkPlan): Boolean =
            p match {
              case _: org.apache.spark.sql.execution.exchange.Exchange =>
                true
              case u @ (_: org.apache.spark.sql.execution.SortExec |
                        _: org.apache.spark.sql.execution.ProjectExec |
                        _: org.apache.spark.sql.execution.FilterExec |
                        _: org.apache.spark.sql.execution
                          .WholeStageCodegenExec |
                        _: org.apache.spark.sql.execution.InputAdapter) =>
                spineHasExchange(u.children.head)
              case _ => false
            }
          val shuffles = spineHasExchange(j.left) || spineHasExchange(j.right)
          if (small.nonEmpty && shuffles)
            out += s"SortMergeJoin(${j.joinType}) shuffles both sides " +
              s"while its ${small.map { case (side, s) =>
                s"$side side is ~$s bytes" }.mkString(", ")} " +
              s"(broadcast threshold $thr)"
        case _ => ()
      }
      p.children.foreach(walk)
    }
    walk(org.apache.spark.sql.GraftBridge.preparedPlan(df))
    out.result()
  }

  /** The assertion surface for specs: empty means no quadratic blow-up
    * signature in the optimized plan. Only the per-element class gates —
    * node-level duplicates are runtime-CSE'd (see
    * [[duplicatedExpensive]]).
    */
  def findings(df: DataFrame): Seq[String] = lambdaInvariants(df)
}
