package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector generating the dense time spine — the leaf the
  * gap-fill semantics stand on (reference: absent chunks materialize as
  * empty points of the exact count, `src/dqe_get.erl:54-60`; SURVEY §2.1
  * maps the leaf scan's spine to a generated relation).
  *
  *   spark.read.format("graft-spine")
  *     .option("startMs", s).option("endMs", e)
  *     .option("stepMs", r)          // default 1000
  *     .option("numPartitions", n)   // default spark default parallelism
  *     .load()                       // → (ts_ms LONG, slot LONG)
  *
  * Scale shape: slots are computed, never stored or collected — each input
  * partition independently generates a contiguous [lo, hi) slice, so a
  * 14-day 1 s spine (1.2 M slots, the reference's max_read envelope) or a
  * year of millions of series costs zero IO and distributes evenly across
  * however many executors exist. Column pruning is honored (a count over
  * the spine reads zero columns).
  */
class SpineSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-spine"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SpineSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SpineTable(SpineSpec.fromOptions(properties))
}

object SpineSource {
  val Schema: StructType = StructType(Seq(
    StructField("ts_ms", LongType, nullable = false),
    StructField("slot", LongType, nullable = false)))
}

private[sources] final case class SpineSpec(startMs: Long, endMs: Long,
                                            stepMs: Long, numPartitions: Int) {
  require(stepMs > 0, "stepMs must be positive")
  require(numPartitions > 0, "numPartitions must be positive")
  val nSlots: Long = math.max(0L, (endMs - startMs + stepMs - 1) / stepMs)
}

private[sources] object SpineSpec {
  def fromOptions(o: util.Map[String, String]): SpineSpec = {
    def req(k: String): Long = {
      val v = o.get(k)
      require(v != null, s"graft-spine: missing required option '$k'")
      v.toLong
    }
    SpineSpec(req("startMs"), req("endMs"),
      Option(o.get("stepMs")).map(_.toLong).getOrElse(1000L),
      Option(o.get("numPartitions")).map(_.toInt).getOrElse(
        org.apache.spark.sql.SparkSession.active
          .sparkContext.defaultParallelism))
  }
}

private[sources] class SpineTable(spec: SpineSpec) extends Table
    with SupportsRead {
  override def name(): String =
    s"graft_spine(${spec.startMs},${spec.endMs},${spec.stepMs})"
  override def schema(): StructType = SpineSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SpineScanBuilder(spec)
}

private[sources] class SpineScanBuilder(spec: SpineSpec) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var schema: StructType = SpineSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    schema = requiredSchema
  override def build(): Scan = new SpineScan(spec, schema)
}

private[sources] class SpineScan(spec: SpineSpec, schema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-spine [${spec.startMs}, ${spec.endMs}) step ${spec.stepMs}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.min(spec.numPartitions.toLong,
      math.max(1L, spec.nSlots)).toInt
    (0 until n).map { i =>
      val lo = spec.nSlots * i / n
      val hi = spec.nSlots * (i + 1) / n
      SpinePartition(lo, hi): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SpineReaderFactory(spec.startMs, spec.stepMs, schema)
}

private[sources] final case class SpinePartition(loSlot: Long, hiSlot: Long)
    extends InputPartition

private[sources] class SpineReaderFactory(startMs: Long, stepMs: Long,
                                          schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SpinePartition]
    new PartitionReader[InternalRow] {
      private var slot = sp.loSlot - 1
      private val cols: Array[Long => Long] = schema.fieldNames.map {
        case "ts_ms" => (s: Long) => startMs + s * stepMs
        case "slot"  => (s: Long) => s
        case other   => throw new IllegalArgumentException(
          s"graft-spine: unknown column $other")
      }
      override def next(): Boolean = { slot += 1; slot < sp.hiSlot }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.map(f => f(slot)).toSeq)
      override def close(): Unit = ()
    }
  }
}
