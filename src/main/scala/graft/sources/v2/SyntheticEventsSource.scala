package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 connector (SURVEY §2.1 S3's "custom DataSourceV2"
  * alternative made concrete): a deterministic synthetic events generator.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.v2.SyntheticEventsProvider")
  *   .option("rows", "5000").option("partitions", "8").load()
  * }}}
  *
  * Every field is a pure function of the row id with overflow-free integer
  * arithmetic, so DuckDB's `range(0, rows)` reproduces the table exactly —
  * the connector itself sits under the oracle gate (q81). Column pruning is
  * pushed into the reader (SupportsPushDownRequiredColumns): a pruned scan
  * materializes only the requested fields. Each InputPartition is an id
  * range, so the source scales by splitting ranges — the same shape a real
  * ranged connector (JDBC partitioned reads, kafka offsets) uses.
  */
object SyntheticEvents {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val baseMicros: Long = 1704067200000000L // 2024-01-01T00:00:00Z
  val types: Array[String] = Array("view", "click", "purchase", "signup", "error")

  def userId(id: Long): Long = id % 150
  def tsMicros(id: Long): Long = baseMicros + id * 1000000L
  def eventType(id: Long): String = types(((id * 7) % 5).toInt)
  def value(id: Long): Double = (((id % 9973) * 31 + 7) % 1000).toDouble / 10.0
}

class SyntheticEventsProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEvents.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticEventsTable
}

class SyntheticEventsTable extends Table with SupportsRead {
  override def name(): String = "graft_synthetic_events"
  override def schema(): StructType = SyntheticEvents.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(
      options.getLong("rows", 1000L),
      options.getInt("partitions", 4))
}

/** Filter pushdown (SupportsPushDownFilters): comparisons on the `id`
  * column tighten the generated [lo, hi) range BEFORE partition planning —
  * the connector-level analogue of parquet row-group pruning or a JDBC
  * WHERE clause: pushed rows are never materialized, never shipped. Pushed
  * id-filters are fully absorbed (not re-evaluated by Spark); every other
  * filter is returned as a residual. */
class SyntheticScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = SyntheticEvents.schema
  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var aggFuncs: Array[AggregateFunc] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Aggregate pushdown (SupportsPushDownAggregates): ungrouped COUNT(*),
    * MIN(id), MAX(id) are answerable ANALYTICALLY from the pushed [lo, hi)
    * range — the scan emits one pre-aggregated row and generates nothing.
    * This is the connector-capability a warehouse source (or a parquet
    * footer reader) uses to turn a full scan into metadata math. Complete
    * pushdown only: anything else (group-bys, sums over generated values)
    * is declined and planned as a normal aggregate over the scan. */
  private def isIdRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: NamedReference => nr.fieldNames.toSeq == Seq("id")
      case _ => false
    }

  private def handled(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => isIdRef(m.column)
        case m: Max => isIdRef(m.column)
        case _ => false
      }

  override def supportCompletePushDown(agg: Aggregation): Boolean = handled(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    if (handled(agg)) { aggFuncs = agg.aggregateExpressions; true }
    else false

  private def bound(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("id", v) => bound(v).isDefined
      case GreaterThan("id", v) => bound(v).isDefined
      case GreaterThanOrEqual("id", v) => bound(v).isDefined
      case LessThan("id", v) => bound(v).isDefined
      case LessThanOrEqual("id", v) => bound(v).isDefined
      case _ => false
    }
    accepted.foreach {
      case EqualTo(_, v) =>
        lo = math.max(lo, bound(v).get); hi = math.min(hi, bound(v).get + 1)
      case GreaterThan(_, v) => lo = math.max(lo, bound(v).get + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, bound(v).get)
      case LessThan(_, v) => hi = math.min(hi, bound(v).get)
      case LessThanOrEqual(_, v) => hi = math.min(hi, bound(v).get + 1)
      case _ => ()
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    if (aggFuncs.nonEmpty)
      new SyntheticAggScan(lo, math.max(lo, hi), aggFuncs, pushed)
    else new SyntheticScan(lo, math.max(lo, hi), partitions, required, pushed)
}

/** Pre-aggregated scan: one row answering the pushed aggregates from range
  * arithmetic (count = hi-lo, min = lo, max = hi-1; NULL min/max on an
  * empty range, matching SQL aggregate semantics). */
class SyntheticAggScan(lo: Long, hi: Long, aggs: Array[AggregateFunc],
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = StructType(aggs.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_synthetic_events AGG-PUSHED range=[$lo,$hi) aggs=[${aggs.mkString(", ")}] pushed=[${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(IdRangePartition(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory = {
    // resolve the answers on the driver; the factory ships only primitives
    val empty = hi <= lo
    val values: Array[Any] = aggs.map {
      case _: CountStar => math.max(0L, hi - lo)
      case _: Min => if (empty) null else lo
      case _: Max => if (empty) null else hi - 1
      case other => throw new IllegalStateException(s"unpushable agg $other")
    }
    new SyntheticAggReaderFactory(values)
  }
}

class SyntheticAggReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(values.toIndexedSeq)
      override def close(): Unit = ()
    }
}

final case class IdRangePartition(start: Long, end: Long) extends InputPartition

class SyntheticScan(lo: Long, hi: Long, partitions: Int, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_synthetic_events range=[$lo,$hi) pushed=[${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] = {
    val rows = hi - lo
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (lo until hi by per)
      .map(s => IdRangePartition(s, math.min(hi, s + per)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)
}

class SyntheticReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[IdRangePartition]
    // resolve each required column to its generator once, not per row
    val gens: Array[Long => Any] = required.fields.map(_.name match {
      case "id" => (id: Long) => id
      case "ts" => (id: Long) => SyntheticEvents.tsMicros(id)
      case "user_id" => (id: Long) => SyntheticEvents.userId(id)
      case "event_type" =>
        (id: Long) => UTF8String.fromString(SyntheticEvents.eventType(id))
      case "value" => (id: Long) => SyntheticEvents.value(id)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    })
    new PartitionReader[InternalRow] {
      private var id = range.start - 1
      override def next(): Boolean = { id += 1; id < range.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.map(g => g(id)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
