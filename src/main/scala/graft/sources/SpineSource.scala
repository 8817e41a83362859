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

/** `baseMs` anchors slot numbering at the ORIGINAL start so filter
  * pushdown (which advances startMs) never renumbers the slot column.
  */
private[sources] final case class SpineSpec(startMs: Long, endMs: Long,
                                            stepMs: Long, numPartitions: Int,
                                            baseMs: Long) {
  require(stepMs > 0, "stepMs must be positive")
  require(numPartitions > 0, "numPartitions must be positive")
  val nSlots: Long = math.max(0L, (endMs - startMs + stepMs - 1) / stepMs)
  val slotOffset: Long = (startMs - baseMs) / stepMs
}

private[sources] object SpineSpec {
  def fromOptions(o: util.Map[String, String]): SpineSpec = {
    def req(k: String): Long = {
      val v = o.get(k)
      require(v != null, s"graft-spine: missing required option '$k'")
      v.toLong
    }
    val start = req("startMs")
    SpineSpec(start, req("endMs"),
      Option(o.get("stepMs")).map(_.toLong).getOrElse(1000L),
      Option(o.get("numPartitions")).map(_.toInt).getOrElse(
        org.apache.spark.sql.SparkSession.active
          .sparkContext.defaultParallelism),
      baseMs = start)
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

private[sources] class SpineScanBuilder(spec0: SpineSpec) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var schema: StructType = SpineSource.Schema
  private var spec: SpineSpec = spec0
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    schema = requiredSchema

  /** ts_ms range predicates narrow the GENERATED range — the connector
    * never produces the filtered-out slots at all (the DSv2 analog of
    * partition pruning; a `LAST 1 h` query over a year-wide spine costs
    * 1 h of generation). Other predicates stay with Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def clampLo(ms: Long): Unit = if (ms > spec.startMs) {
      // snap UP to the next on-grid slot >= ms
      val k = (ms - spec.startMs + spec.stepMs - 1) / spec.stepMs
      spec = spec.copy(startMs = spec.startMs + k * spec.stepMs)
    }
    def clampHi(endExclusive: Long): Unit = if (endExclusive < spec.endMs)
      spec = spec.copy(endMs = endExclusive)
    val (accepted, rejected) = filters.partition {
      case GreaterThan("ts_ms", v: Long)        => clampLo(v + 1); true
      case GreaterThanOrEqual("ts_ms", v: Long) => clampLo(v); true
      case LessThan("ts_ms", v: Long)           => clampHi(v); true
      case LessThanOrEqual("ts_ms", v: Long)    => clampHi(v + 1); true
      case IsNotNull("ts_ms") | IsNotNull("slot") => true // never null
      case _                                    => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

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
    new SpineReaderFactory(spec.startMs, spec.stepMs, spec.slotOffset, schema)
}

private[sources] final case class SpinePartition(loSlot: Long, hiSlot: Long)
    extends InputPartition

private[sources] class SpineReaderFactory(startMs: Long, stepMs: Long,
                                          slotOffset: Long,
                                          schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SpinePartition]
    new PartitionReader[InternalRow] {
      private var slot = sp.loSlot - 1
      private val cols: Array[Long => Long] = schema.fieldNames.map {
        case "ts_ms" => (s: Long) => startMs + s * stepMs
        case "slot"  => (s: Long) => slotOffset + s
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
