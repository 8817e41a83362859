package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** `Σ_j lut[j][codes[j]]` as a LONG — the per-candidate half of ADC PQ
  * scoring: `m` array lookups against a query-side [[PqAdcLut]] (or the
  * index-wide norm table) instead of an O(dim) reconstruction dot.
  * Codes outside a table row (the -1 sentinel of an unpacked subspace,
  * guarded out upstream by `pqEncode`'s size filter) contribute 0.
  */
case class PqLutSum(codes: Expression, lut: Expression)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = lut

  override def dataType: DataType = LongType

  override def nullSafeEval(c: Any, l: Any): Any =
    PqLutSum.compute(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val cls = PqLutSum.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($c, $l);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLutSum =
    copy(codes = newLeft, lut = newRight)
}

object PqLutSum {
  /** static so generated code can call it */
  def compute(codes: ArrayData, lut: ArrayData): Long = {
    val n = math.min(codes.numElements(), lut.numElements())
    var acc = 0L
    var j = 0
    while (j < n) {
      val c = codes.getInt(j)
      val row = lut.getArray(j)
      if (c >= 0 && c < row.numElements()) acc += row.getLong(c)
      j += 1
    }
    acc
  }

  def apply(codes: Column, lut: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(PqLutSum(GraftBridge.expression(codes),
      GraftBridge.expression(lut)))
  }
}
