package graft.expr

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** HDR-histogram sketch aggregation (reference: `src/dqe_hist.erl` wraps
  * the hdr_histogram NIF; SURVEY §2.7). This is the faithful
  * sketch-semantics variant — the gate queries use the FUSED exact path
  * (HistQueries) because exact stats are strictly tighter; this Aggregator
  * exists for histogram-typed workloads where the sketch IS the contract:
  * mergeable across partitions, fixed memory, value-independent error
  * bound of one sub-bucket (relative error ≤ 10^-sf).
  *
  * Bucketing is the public HDR scheme: sub-bucket resolution 2·10^sf
  * rounded to a power of two, exponentially growing bucket ranges,
  * quantiles reported at the highest equivalent value of their bucket.
  * The buffer is a sparse counts map — mergeable with a plain map-union,
  * so partial aggregation (map-side combine) works like any built-in agg.
  */
object HdrHistogram {

  /** Sparse sketch buffer. MUTABLE by design: the buffer rides between
    * rows in object form (Kryo-encoded only at partial-agg exchange), so
    * reduce/merge update in place — the previous immutable Map paid
    * persistent-HashMap path-copy allocations per input ROW on the
    * aggregation hot path, which is exactly the fixed-memory sketch's
    * selling point inverted. The map is java.util.HashMap, NOT
    * scala.mutable.LongMap: Kryo's FieldSerializer does not reconstruct
    * LongMap's internal invariants and the deserialized map SIGSEGVs the
    * JVM on iteration (observed in-suite); java maps go through Kryo's
    * MapSerializer, which rebuilds via put().
    */
  final case class Buf(
      counts: java.util.HashMap[java.lang.Long, java.lang.Long],
      var total: Long)

  /** index math for one (sf) configuration */
  final class Layout(val sf: Int) extends Serializable {
    require(sf >= 1 && sf <= 5, "significant figures must be 1..5")
    private val subBucketMagnitude: Int = {
      val needed = 2L * math.pow(10, sf).toLong
      64 - java.lang.Long.numberOfLeadingZeros(needed - 1)
    }
    val subBucketCount: Int = 1 << subBucketMagnitude
    val subBucketHalfCount: Int = subBucketCount / 2

    /** linear index of the value's bucket (sparse key) */
    def indexOf(v: Long): Long = {
      val value = math.max(v, 0L)
      // values below subBucketCount land in bucket 0 (exact, width 1)
      val bucketIdx = 64 - subBucketMagnitude -
        java.lang.Long.numberOfLeadingZeros(value | (subBucketCount - 1))
      val subBucketIdx = value >>> bucketIdx
      (bucketIdx.toLong + 1) * subBucketHalfCount +
        (subBucketIdx - subBucketHalfCount)
    }

    /** highest value mapping to the same bucket as the index */
    def highestEquivalent(idx: Long): Long = {
      val bucketIdx = (idx / subBucketHalfCount).toInt - 1
      val subBucketIdx = (idx % subBucketHalfCount) + subBucketHalfCount
      val (b, s) =
        if (bucketIdx < 0) (0, subBucketIdx - subBucketHalfCount)
        else (bucketIdx, subBucketIdx)
      ((s + 1) << b) - 1
    }
  }

  /** quantile over a finished buffer: smallest bucket whose cumulative
    * count reaches ceil(p·total), reported at its highest equivalent
    * value (HDR convention).
    */
  def quantile(layout: Layout, buf: Buf, p: Double): Double = {
    if (buf.total == 0) return Double.NaN
    val target = math.max(1L, math.ceil(p * buf.total).toLong)
    val entries = {
      val b = Seq.newBuilder[(Long, Long)]
      buf.counts.forEach((k, n) => { b += ((k.longValue, n.longValue)); () })
      b.result().sortBy(_._1)
    }
    var cum = 0L
    for ((idx, n) <- entries) {
      cum += n
      if (cum >= target) return layout.highestEquivalent(idx).toDouble
    }
    layout.highestEquivalent(entries.last._1).toDouble
  }

  /** `Aggregator[value, sketch, p-quantile]` for long-rounded inputs
    * (the reference rounds to ints before insert, dqe_hist.erl:53-57).
    *
    * Range semantics follow the reference sketch (quoted in
    * dql/Compiler.scala:457-463): values below 0 and above `htv` (the
    * highest trackable value) are DROPPED — they never enter the
    * histogram or its total. The previous behavior clamped negatives to
    * bucket 0, counting phantom zeros for standalone users of this
    * Aggregator (the DQL gates pre-filter and never saw it); `htv`
    * defaults to unbounded for callers without a configured ceiling.
    */
  final class PercentileAgg(sf: Int, p: Double, htv: Long = Long.MaxValue)
      extends Aggregator[java.lang.Long, Buf, Double] {
    @transient private lazy val layout = new Layout(sf)
    def zero: Buf = Buf(new java.util.HashMap, 0L)
    def reduce(b: Buf, v: java.lang.Long): Buf = {
      if (v == null || v < 0L || v > htv) b
      else {
        val idx = java.lang.Long.valueOf(layout.indexOf(v))
        val prev = b.counts.get(idx)
        b.counts.put(idx, if (prev == null) 1L else prev + 1L)
        b.total += 1
        b
      }
    }
    def merge(a: Buf, b: Buf): Buf = {
      b.counts.forEach { (k, n) =>
        val prev = a.counts.get(k)
        a.counts.put(k, if (prev == null) n else prev + n)
      }
      a.total += b.total
      a
    }
    def finish(b: Buf): Double = quantile(layout, b, p)
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** DataFrame-usable column function: `hdrPercentile(sf, p)(col)` */
  def hdrPercentile(sf: Int, p: Double, htv: Long = Long.MaxValue)
      : Column => Column = {
    val f = udaf(new PercentileAgg(sf, p, htv), Encoders.LONG)
    c => f(c)
  }
}
