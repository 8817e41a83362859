package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.DoubleType

/** `spark.sql.extensions=graft.GraftExtensions` — the standard injection
  * point for the engine's custom Catalyst surface, so ANY session (spark-
  * submit, thrift server, notebooks) gets:
  *
  *   - the [[graft.plans.GapFillStrategy]] physical strategy (the custom
  *     partition-local densification operator; also runtime-installable
  *     via [[graft.plans.GapFillOps.install]])
  *   - the [[graft.plans.GapFillRangeRule]] optimizer rule (time filters
  *     narrow the operator's generation bounds)
  *   - `graft_dot(a, b)` as a SQL function: the exact fixed-point dot
  *     product ([[graft.expr.FixedPointDot]], whole-stage-codegen'd) over
  *     float/double array columns, returned as double on the engine's
  *     1e15 scale — the same kernel the Scala API uses via
  *     [[graft.pipeline.VectorOps.dot]]
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.GapFillStrategy)
    ext.injectOptimizerRule(_ => graft.plans.GapFillRangeRule)
    ext.injectFunction(GraftExtensions.graftDot)
    ext.injectFunction(GraftExtensions.graftFingerprint)
  }
}

object GraftExtensions {
  private val Scale = graft.pipeline.VectorOps.Scale

  val graftDot: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[graft.expr.FixedPointDot].getName, "graft_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_dot(arrayA, arrayB)")
      Divide(
        Cast(graft.expr.FixedPointDot(args(0), args(1), Scale), DoubleType),
        Literal(Scale))
    })

  /** `graft_fingerprint(text[, len])` — the [[graft.expr.MinShingleMd5]]
    * rolling-hash fingerprint kernel (len defaults to 8)
    */
  val graftFingerprint: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_fingerprint"),
    new ExpressionInfo(classOf[graft.expr.MinShingleMd5].getName,
      "graft_fingerprint"),
    (args: Seq[Expression]) => args match {
      case Seq(text) => graft.expr.MinShingleMd5(text, 8)
      case Seq(text, Literal(n: Int, _)) =>
        graft.expr.MinShingleMd5(text, n)
      case _ => throw new IllegalArgumentException(
        "graft_fingerprint(text[, intLiteralLen])")
    })
}
