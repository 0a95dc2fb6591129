package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
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

class SyntheticScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SyntheticEvents.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SyntheticScan(rows, partitions, required)
}

final case class IdRangePartition(start: Long, end: Long) extends InputPartition

class SyntheticScan(rows: Long, partitions: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per)
      .map(s => IdRangePartition(s, math.min(rows, s + per)): InputPartition)
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
