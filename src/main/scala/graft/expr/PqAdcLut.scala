package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native ADC (asymmetric-distance-computation) lookup table for PQ
  * scoring: `lut[j][code] = Σ_i round_half_away(v[j·sub+i] · cbs[j][code][i]
  * · scale)` — the per-subspace scaled-long PARTIAL dot of the query
  * against every codebook entry, built ONCE per query row over the
  * broadcast packed codebook array (see `Similarity.pqPacked`).
  *
  * Because [[FixedPointDot]] rounds per element and sums exact longs, the
  * full query·reconstruction dot of a candidate coded `codes` is EXACTLY
  * `Σ_j lut[j][codes[j]]` ([[PqLutSum]]) — long addition is associative,
  * so the classic ADC execution is bit-identical to materializing the
  * reconstruction and running the O(dim) kernel per candidate
  * (PqAdcSpec pins row-for-row equality). Scoring cost per candidate
  * drops from O(dim) rounded multiplies + an array materialization to
  * `m` long lookups; the table build amortizes across every candidate in
  * the probed cells.
  *
  * Subvector/entry length mismatches truncate to the shorter — the same
  * min-length convention as [[FixedPointDot]] and `slice`.
  */
case class PqAdcLut(vec: Expression, cbs: Expression, m: Int, sub: Int,
                    scale: Double)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cbs

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  private def vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private def cbIsFloat: Boolean = cbs.dataType match {
    case ArrayType(ArrayType(ArrayType(FloatType, _), _), _) => true
    case _                                                   => false
  }

  override def nullSafeEval(v: Any, c: Any): Any =
    PqAdcLut.compute(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      m, sub, vecIsFloat, cbIsFloat, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val cls = PqAdcLut.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($v, $c, $m, $sub, $vecIsFloat, $cbIsFloat, ${scale}d);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcLut =
    copy(vec = newLeft, cbs = newRight)
}

object PqAdcLut {
  /** static so generated code can call it */
  def compute(vec: ArrayData, cbs: ArrayData, m: Int, sub: Int,
              vf: Boolean, cf: Boolean, scale: Double): ArrayData = {
    val vlen = vec.numElements()
    val nj = math.min(m, cbs.numElements())
    val luts = new Array[ArrayData](nj)
    var j = 0
    while (j < nj) {
      val off = j * sub
      val la = math.max(0, math.min(sub, vlen - off))
      val cbj = cbs.getArray(j)
      val kc = cbj.numElements()
      val row = new Array[Long](kc)
      var c = 0
      while (c < kc) {
        val cb = cbj.getArray(c)
        val n = math.min(la, cb.numElements())
        var acc = 0L
        var i = 0
        while (i < n) {
          val a = if (vf) vec.getFloat(off + i).toDouble
                  else vec.getDouble(off + i)
          val b = if (cf) cb.getFloat(i).toDouble else cb.getDouble(i)
          acc += FixedPointDot.roundHalfAway(a * b * scale)
          i += 1
        }
        row(c) = acc
        c += 1
      }
      luts(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(luts.asInstanceOf[Array[Any]])
  }

  def apply(vec: Column, cbs: Column, m: Int, sub: Int,
            scale: Double): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(PqAdcLut(GraftBridge.expression(vec),
      GraftBridge.expression(cbs), m, sub, scale))
  }
}
