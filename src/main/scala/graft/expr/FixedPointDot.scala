package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native fixed-point dot product: `Σ round_half_away(a[i]*b[i]*scale)` as
  * a LONG — the hot kernel of the similarity/dedup vector path.
  *
  * Why a custom Catalyst expression (builder brief preference (b)): the
  * composed `zip_with`+`aggregate` form evaluates interpreted lambdas with
  * per-element boxing; this expression stays inside whole-stage codegen as
  * a primitive loop. Fixed-point accumulation keeps the sum associative —
  * exact, partition-order-independent, bit-identical to the DuckDB oracle.
  *
  * Rounding is half-away-from-zero computed on the EXACT double (floor +
  * exact-fraction compare, no `x+0.5` double-rounding) — matching Spark's
  * `round()` (BigDecimal HALF_UP), C's `round()` (DuckDB), and the
  * previous higher-order formulation on every input.
  *
  * Array elements are assumed non-null (embedding vectors); both float[]
  * and double[] children are supported.
  */
case class FixedPointDot(left: Expression, right: Expression, scale: Double)
    extends BinaryExpression {

  // analysis-time typing: this kernel is user-reachable through the
  // registered SQL function graft_dot(a, b) — a mistyped argument must
  // be an AnalysisException, not a codegen compile fallback plus an
  // executor-side ClassCastException mid-job
  override def checkInputDataTypes(): TypeCheckResult = {
    def vec(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (vec(left.dataType) && vec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "graft_dot expects array<float>/array<double> arguments, got (" +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += FixedPointDot.roundHalfAway(xv * yv * scale)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      // every local must be ctx.freshName'd: a bare `i`/`v` colliding with
      // an enclosing whole-stage-codegen scope fails Java compilation and
      // silently drops the whole stage to interpreted evaluation
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val lGet = if (isFloat(left)) s"(double)$l.getFloat($i)" else s"$l.getDouble($i)"
      val rGet = if (isFloat(right)) s"(double)$r.getFloat($i)" else s"$r.getDouble($i)"
      // ONE rounding implementation: the generated code calls the same
      // static helper the interpreted path uses (the package convention —
      // JIT inlines the static call). A hand-inlined second copy of the
      // exactness-critical half-away rounding here once risked silently
      // desyncing codegen from interpreted/oracle results on a future
      // tie-handling edit.
      val cls = FixedPointDot.getClass.getName.stripSuffix("$")
      s"""
         |int $n = Math.min($l.numElements(), $r.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $cls.roundHalfAway(($lGet) * ($rGet) * ${scale}d);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDot =
    copy(left = newLeft, right = newRight)
}

object FixedPointDot {
  /** half-away-from-zero on the exact double value: `a - f` is exact
    * (Sterbenz), so no `x+0.5` misrounding near ties — agrees with
    * BigDecimal HALF_UP and C round() everywhere.
    */
  def roundHalfAway(v: Double): Long = {
    val a = math.abs(v)
    val f = math.floor(a)
    val r = if (a - f >= 0.5) f + 1.0 else f
    (if (v < 0) -r else r).toLong
  }

  def apply(a: Column, b: Column, scale: Double): Column = {
    // Spark 4: Column wraps a ColumnNode; GraftBridge reaches the classic
    // Column↔Expression converters
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      FixedPointDot(GraftBridge.expression(a), GraftBridge.expression(b),
        scale))
  }
}
