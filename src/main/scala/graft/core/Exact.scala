package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic aggregation helpers.
  *
  * Floating-point sums are order-dependent; Spark and the DuckDB oracle
  * aggregate partitions in different orders, so a plain `sum(double)` can
  * differ in the last ulps and fail a hash compare. Routing sums through
  * fixed-point decimals makes the fold exact (associative), so both engines
  * produce the same decimal, and the final cast back to double is a
  * deterministic IEEE operation. Derived statistics (mean, variance) are
  * computed from exact moments with identical double arithmetic on both
  * sides.
  *
  * This is a *testing* convention, not a performance compromise: decimal
  * sums are still map-side-combinable, shuffle-free beyond the groupBy, and
  * codegen'd by Catalyst (whole-stage codegen covers Decimal arithmetic).
  */
object Exact {
  /** fractional digits carried through decimal sums */
  val S = 10

  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, S))).cast("double")

  /** Mean from exact sum; double division is deterministic. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Population variance from exact moments, clamped at 0 (epsilon guard). */
  def dvarPop(c: Column): Column = {
    val n = count(c).cast("double")
    greatest(
      sum((c * c).cast(DecimalType(38, S))).cast("double") / n -
        pow(sum(c.cast(DecimalType(28, S))).cast("double") / n, 2.0),
      lit(0.0))
  }

  def dstddevPop(c: Column): Column = sqrt(dvarPop(c))

  /** Tumbling-window start: ts - (ts mod w), all in epoch millis. */
  def wstart(tsMs: Column, w: Long): Column =
    (tsMs - pmod(tsMs, lit(w))).cast("long")

  /** Driver-side mirror of `round(col, 9)` on a DoubleType column: Spark's
    * Round lowers to `BigDecimal(d).setScale(scale, HALF_UP).toDouble`
    * (Scala `BigDecimal(d)` = `valueOf` = the Double.toString shortest
    * decimal), with NaN/Inf passed through. Bit-identical to the codegen'd
    * expression, so a collected value re-rounded here equals the value the
    * distributed plan would have produced.
    */
  def round9(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver-side mirror of [[dsum]] over already-collected doubles: each
    * term goes through the same double→DECIMAL(28,10) conversion Spark's
    * Cast performs (valueOf + setScale(10, HALF_UP)), the fold is exact,
    * and the final doubleValue matches Decimal→double lowering.
    */
  def dsumDriver(xs: Iterable[Double]): Double = {
    var acc = java.math.BigDecimal.ZERO
    xs.foreach { x =>
      acc = acc.add(java.math.BigDecimal.valueOf(x)
        .setScale(S, java.math.RoundingMode.HALF_UP))
    }
    acc.doubleValue
  }

  /** SQL (DuckDB) counterparts — keep in lockstep with the Column forms.
    * The decimal→double hop goes through VARCHAR: DuckDB's direct
    * decimal→double cast is not correctly rounded (int128 → double → /1e10
    * double-rounds), while string→double parsing is — matching Java
    * BigDecimal.doubleValue on the Spark side bit-for-bit.
    */
  def dsumSql(c: String): String =
    s"CAST(CAST(SUM(CAST($c AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"
  def davgSql(c: String): String = s"${dsumSql(c)}/COUNT($c)"
  def dvarPopSql(c: String): String =
    s"GREATEST(CAST(CAST(SUM(CAST(($c)*($c) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)/COUNT($c)" +
      s" - POW(${dsumSql(c)}/COUNT($c), 2.0), 0.0)"
  def dstddevPopSql(c: String): String = s"SQRT(${dvarPopSql(c)})"
  // floor-mod like the Spark side's pmod, not DuckDB's truncating % —
  // the two diverge on pre-epoch (negative) timestamps (r17 review)
  def wstartSql(tsMs: String, w: Long): String =
    s"CAST($tsMs - ((($tsMs) % $w + $w) % $w) AS BIGINT)"
}
