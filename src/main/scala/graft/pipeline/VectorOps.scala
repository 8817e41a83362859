package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic vector math over `array<float>` embedding columns.
  *
  * Everything is built for cross-engine reproducibility AND scale: the dot
  * product folds scaled-long terms (`round(x*y*1e15)` summed as BIGINT), so
  * the sum is associative/exact — the same result regardless of partition
  * order, and bit-identical to the DuckDB oracle. All expressions are
  * codegen'd `functions._` higher-order forms — no UDFs, no driver loops;
  * a 100 TB pairwise job distributes as plain narrow transforms.
  */
object VectorOps {
  /** Scale for the fixed-point dot product: products of unit-ish floats
    * ×1e15 summed over ≤1k dims stays well under 2^63.
    */
  val Scale = 1e15

  /** Exact scaled-long dot product of two float arrays, as double.
    * Implemented as the native codegen'd [[graft.expr.FixedPointDot]]
    * kernel (the zip_with+aggregate composition evaluates interpreted
    * lambdas — same values, ~an order of magnitude slower per pair).
    */
  def dot(a: Column, b: Column): Column =
    graft.expr.FixedPointDot(a, b, Scale).cast("double") / Scale

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    cosineOf(dot(a, b), norm(a), norm(b))

  /** TOTAL cosine from a precomputed dot and norms: a zero-norm vector
    * (all-zero embedding) must yield IEEE 0/0 = NaN, not an ANSI
    * DIVIDE_BY_ZERO error killing the whole job (Spark 4 runs ANSI by
    * default; one bad vector in a 100 TB corpus must not abort the
    * scan). NaN then follows the engines' native NaN-largest sort order,
    * and DuckDB reaches the same NaN through its plain IEEE division —
    * oracles agree with no SQL change. Every similarity kernel funnels
    * its division through here (ZeroVectorParitySpec).
    */
  def cosineOf(dotv: Column, n1: Column, n2: Column): Column = {
    val den = n1 * n2
    when(den === 0d, lit(Double.NaN)).otherwise(dotv / den)
  }

  /** DuckDB mirrors (dim = array length; DuckDB lists are 1-based). */
  def dotSql(a: String, b: String, dim: Int): String =
    s"CAST(CAST(list_sum([CAST(ROUND(CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE)*1e15, 0) AS BIGINT) " +
      s"for i in range(1, ${dim + 1})]) AS BIGINT) AS DOUBLE)/1e15"
  def normSql(a: String, dim: Int): String = s"SQRT(${dotSql(a, a, dim)})"
  def cosineSql(a: String, b: String, dim: Int): String =
    s"${dotSql(a, b, dim)} / (${normSql(a, dim)} * ${normSql(b, dim)})"

  /** Dequantize per-vector int8 scalar-quantized codes back to doubles:
    * `lo + (code + 128) * step`. The +128 undoes the storage offset that
    * fits the [0, 255] code range into a signed byte — the offset is pure
    * storage, the reconstructed values are identical to the unshifted
    * form, which is what [[sq8DequantSql]] mirrors. Result is an
    * `array<double>` accepted directly by the fixed-point [[dot]].
    */
  def sq8Dequant(code: Column, lo: Column, step: Column): Column =
    transform(code, c => lo + (c.cast("double") + lit(128d)) * step)

  /** DuckDB mirrors for the SQ8 path. `code0` is the UNSHIFTED [0, 255]
    * code (see [[sq8Dequant]] — bit-identical reconstruction): element i
    * of the code list built by [[sq8CodeSql]].
    */
  def sq8CodeSql(v: String, lo: String, rng: String): String =
    s"(CASE WHEN $rng = 0 THEN 0 ELSE CAST(ROUND((CAST($v AS DOUBLE) - $lo)/$rng*255, 0) AS INTEGER) END)"
  def sq8DequantSql(lo: String, code0: String, step: String): String =
    s"($lo + CAST($code0 AS DOUBLE) * $step)"
  /** Fixed-point dot of a float query against a dequantized SQ8 vector —
    * same scaled-long fold as [[dotSql]], corpus side reconstructed
    * per-term.
    */
  def sq8DotSql(q: String, lo: String, code0: String, step: String,
                dim: Int): String =
    s"CAST(CAST(list_sum([CAST(ROUND(CAST($q[i] AS DOUBLE)*${sq8DequantSql(lo, s"$code0[i]", step)}*1e15, 0) AS BIGINT) " +
      s"for i in range(1, ${dim + 1})]) AS BIGINT) AS DOUBLE)/1e15"
  def sq8NormSql(lo: String, code0: String, step: String,
                 dim: Int): String = {
    val d = sq8DequantSql(lo, s"$code0[i]", step)
    s"SQRT(CAST(CAST(list_sum([CAST(ROUND($d*$d*1e15, 0) AS BIGINT) " +
      s"for i in range(1, ${dim + 1})]) AS BIGINT) AS DOUBLE)/1e15)"
  }

  /** Deterministic pseudo-random hyperplane component for LSH bit `j`,
    * dimension `d` (1-based): the first hex digit of md5("j_d") mapped to
    * [-7.5, 7.5]. Same construction in [[hyperplaneSql]].
    */
  def hyperplane(j: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to dim).map { d =>
      val hex = md.digest(s"${j}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 1), 16) - 7.5
    }.toArray
  }

  /** SQL for the signed projection of `v` onto hyperplane `j` (scaled-long
    * exact sum): mirrors `hyperplane(j, dim) · v > 0`.
    */
  def projPositiveSql(v: String, j: Int, dim: Int): String =
    s"CAST(list_sum([CAST(ROUND((strpos('0123456789abcdef', substr(md5('${j}_' || CAST(i AS VARCHAR)),1,1)) - 8.5)" +
      s" * CAST($v[i] AS DOUBLE) * 1e14, 0) AS BIGINT) for i in range(1, ${dim + 1})]) AS BIGINT) > 0"

  /** Column form of [[projPositiveSql]]: same fixed-point fold with the
    * hyperplane baked in as a literal array.
    */
  def projPositive(v: Column, j: Int, dim: Int): Column = {
    val r = hyperplane(j, dim)
    val rCol = array(r.map(lit(_)): _*)
    graft.expr.FixedPointDot(rCol, v, 1e14) > 0
  }

  /** 16-bit LSH bucket id from hyperplane sign bits. */
  def lshBucket(v: Column, bits: Int, dim: Int): Column =
    (0 until bits).map(j =>
      when(projPositive(v, j, dim), lit(1L << j)).otherwise(0L))
      .reduce(_ + _)

  def lshBucketSql(v: String, bits: Int, dim: Int): String =
    (0 until bits).map(j =>
      s"(CASE WHEN ${projPositiveSql(v, j, dim)} THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
}
