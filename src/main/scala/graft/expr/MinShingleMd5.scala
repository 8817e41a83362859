package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the rolling-hash document fingerprint: the minimum
  * md5 (hex) over every `len`-char substring of the input — identical
  * output to `array_min(transform(sequence(1, length-_), i ->
  * md5(substr(text, i, len))))`, which materializes ~length strings and an
  * array per ROW. This expression runs one tight loop per row: a single
  * reused MessageDigest, char-correct byte slicing, 16-byte unsigned min
  * tracking, hex only for the winner. ~5× on the corpus (the composed
  * form was the slowest pipeline gate at sf0.1; the DuckDB oracle runs
  * the same loop natively).
  *
  * NULL for inputs shorter than `len` (matches the oracle's empty-range
  * NULL — see TextOps.fingerprint's guard rationale).
  *
  * Codegen: the loop lives in a static method; doGenCode emits one call,
  * so whole-stage codegen stays intact around it.
  */
case class MinShingleMd5(child: Expression, len: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinShingleMd5.compute(input.asInstanceOf[UTF8String], len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = MinShingleMd5.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = $cls.compute($c, $len);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinShingleMd5 =
    copy(child = c)
}

object MinShingleMd5 {
  /** static so generated code can call it; returns null when the input is
    * shorter than `len` chars
    */
  def compute(s: UTF8String, len: Int): UTF8String = {
    val nChars = s.numChars()
    if (nChars < len) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    if (s.numBytes() == nChars) {
      // pure-ASCII fast path: char slices ARE byte slices — digest
      // directly over one materialized byte array, no per-position
      // allocation at all
      val bytes = s.getBytes
      var i = 0
      while (i <= bytes.length - len) {
        md.reset()
        md.update(bytes, i, len)
        val d = md.digest()
        if (best == null || unsignedLess(d, best)) best = d
        i += 1
      }
    } else {
      var i = 1
      while (i <= nChars - len + 1) {
        // char-correct slice (matches substr semantics on any input)
        val sub = s.substringSQL(i, len)
        md.reset()
        val d = md.digest(sub.getBytes)
        if (best == null || unsignedLess(d, best)) best = d
        i += 1
      }
    }
    UTF8String.fromString(best.map("%02x".format(_)).mkString)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def apply(c: Column, len: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(MinShingleMd5(GraftBridge.expression(c), len))
  }
}
