package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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

  // plan-time validation: this kernel is user-reachable through the
  // registered SQL function graft_fingerprint(text, len), so a bad len
  // must fail at planning, not as a mid-job MessageDigest crash on an
  // executor (len = -1 previously called md.update(bytes, i, -1))
  require(len >= 1,
    s"graft_fingerprint: shingle length must be >= 1, got $len")

  // analysis-time typing (same rationale as FixedPointDot): a mistyped
  // argument to graft_fingerprint must fail analysis, not cast-crash an
  // executor
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint expects a string argument, got " +
        child.dataType.simpleString)
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
      // non-ASCII path: slide a BYTE-offset window over the chars — each
      // step advances the window's start/end by one UTF-8 char, so the
      // whole scan is O(nBytes). (The previous substringSQL(i, len) form
      // re-walked the string from the start at every position: O(n²) on
      // exactly the CJK/accented rows this kernel exists to speed up.)
      val bytes = s.getBytes
      def step(off: Int): Int =
        off + UTF8String.numBytesForFirstByte(bytes(off))
      var start = 0
      var end = 0
      var k = 0
      while (k < len) { end = step(end); k += 1 }
      var i = 0
      val last = nChars - len
      while (i <= last) {
        md.reset()
        md.update(bytes, start, end - start)
        val d = md.digest()
        if (best == null || unsignedLess(d, best)) best = d
        if (i < last) { start = step(start); end = step(end) }
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
