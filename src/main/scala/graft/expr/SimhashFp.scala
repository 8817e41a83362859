package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the 64-bit SimHash document fingerprint: returns
  * `[fp_hi, fp_lo]` (two unsigned-32-bit halves, see Dedup.simhash for the
  * lane rationale) — identical output to the composed form
  * `split(trim(text), " ")` → one md5 per word → the hex halves as ±1
  * votes per bit position → sign bits packed per half.
  *
  * Why native: the fingerprint is a pure per-row function, but every
  * DataFrame formulation of it pays an interpreter tax — the explode +
  * groupBy plan kept 64 SUM(CASE) aggregate buffers per in-flight doc
  * (the round-8 bench breach), and a higher-order-function fold is
  * evaluated interpreted (HOFs are CodegenFallback) at ~32 lambda
  * invocations per word per half. This expression runs one tight loop
  * per row: byte-level single-space tokenization (0x20 never occurs
  * inside a UTF-8 multibyte sequence, so byte slicing is char-correct),
  * a single reused MessageDigest, integer vote counters. The DuckDB
  * oracle (Dedup.simhashSql) computes the same md5-derived votes
  * natively, so gate parity is unchanged.
  *
  * Split semantics match `split(trim(s), " ")` with Spark's default
  * limit -1 AND DuckDB's `string_split(trim(s), ' ')`: every
  * single-space-delimited field is a word, INCLUDING empty fields from
  * consecutive spaces, and an empty trimmed input yields one empty word.
  *
  * Codegen: the loop lives in a static method; doGenCode emits one call,
  * so whole-stage codegen stays intact around it.
  */
case class SimhashFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    SimhashFp.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = SimhashFp.getClass.getName.stripSuffix("$")
      s"${ev.value} = ($ArrayDataCls) $cls.compute($c);"
    })

  private def ArrayDataCls = classOf[ArrayData].getName

  override protected def withNewChildInternal(c: Expression): SimhashFp =
    copy(child = c)
}

object SimhashFp {
  /** static so generated code can call it */
  def compute(text: UTF8String): ArrayData = {
    val all = text.getBytes
    // trim = leading/trailing 0x20 only (Spark's trim() and DuckDB's
    // trim() default — no other whitespace)
    var lo = 0
    var hi = all.length
    while (lo < hi && all(lo) == ' ') lo += 1
    while (hi > lo && all(hi - 1) == ' ') hi -= 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    var start = lo
    var i = lo
    while (i <= hi) {
      if (i == hi || all(i) == ' ') {
        md.reset()
        md.update(all, start, i - start)
        val d = md.digest()
        // hv_hi = hex chars 1-8 = bytes 0-3 big-endian unsigned;
        // hv_lo = hex chars 9-16 = bytes 4-7
        val hvHi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val hvLo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var j = 0
        while (j < 32) {
          votes(j) += (if (((hvHi >>> j) & 1L) == 1L) 1 else -1)
          votes(32 + j) += (if (((hvLo >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var fpHi = 0L
    var fpLo = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) fpHi |= 1L << j
      if (votes(32 + j) > 0) fpLo |= 1L << j
      j += 1
    }
    new GenericArrayData(Array(fpHi, fpLo))
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(SimhashFp(GraftBridge.expression(c)))
  }
}
