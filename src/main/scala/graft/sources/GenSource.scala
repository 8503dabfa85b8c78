package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSourceV2 batch source — the custom-SOURCE tier of the extension
  * ladder (the custom-operator tiers are cosine_f32 / topk_by_score / the
  * as-of join plan; this is the same idea at the SCAN boundary). Generates
  * a deterministic table without any files: `rows` rows split across
  * `numPartitions` planned input partitions, each reader producing its
  * [lo, hi) slice independently — the minimal honest skeleton of every
  * external system connector (JDBC shards, Kafka topic-partitions, a REST
  * cursor): plan splits on the driver, read rows in executors, never
  * materialize on one node.
  *
  * Schema: id BIGINT (0..rows-1), val BIGINT = (id·2654435761) mod 1000 —
  * a Knuth-hash spread that an oracle reproduces in closed form.
  *
  * Implements `SupportsPushDownRequiredColumns`: a projection that only
  * needs `val` never constructs `id` values beyond the loop counter — the
  * DSv2 contract that makes 100 TB connectors viable (`.explain` shows
  * ReadSchema pruned at the scan, same as parquet).
  */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("numPartitions", "8").toInt)
}

object GenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", LongType, nullable = false)))

  def valOf(id: Long): Long = (id * 2654435761L) % 1000L
}

private[sources] class GenTable(rows: Long, numPartitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_gen($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, numPartitions,
      options.getLong("batchSize", 1000L))
}

private[sources] class GenScanBuilder(rows: Long, numPartitions: Int,
    batchSize: Long) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GenSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GenScan(rows, numPartitions, batchSize, required)
}

private[sources] class GenScan(rows: Long, numPartitions: Int,
    batchSize: Long, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + numPartitions - 1) / numPartitions)
    (0L until rows by per)
      .map(lo => GenPartition(lo, math.min(lo + per, rows)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GenMicroBatchStream(rows, batchSize, numPartitions, required.fieldNames)
}

/** The STREAMING read path: a MicroBatchStream with admission control —
  * offsets are plain row positions, `latestOffset(start, limit)` admits
  * `batchSize` rows per trigger, and `SupportsTriggerAvailableNow`
  * snapshots the end so `Trigger.AvailableNow` drains the source across
  * SEVERAL bounded micro-batches exactly like a backlogged Kafka topic.
  * This is the offset/admission skeleton every streaming connector
  * implements; planInputPartitions(start, end) re-slices each admitted
  * range so batch and stream share the executor-side reader. */
private[sources] class GenMicroBatchStream(rows: Long, batchSize: Long,
    numPartitions: Int, fields: Array[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private case class Pos(v: Long) extends Offset {
    override def json(): String = v.toString
  }
  @volatile private var target: Long = rows

  override def prepareForTriggerAvailableNow(): Unit = target = rows
  override def initialOffset(): Offset = Pos(0L)
  override def latestOffset(): Offset = Pos(rows)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    Pos(math.min(start.asInstanceOf[Pos].v + batchSize, target))
  override def reportLatestOffset(): Offset = Pos(target)
  override def deserializeOffset(json: String): Offset = Pos(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[Pos].v
    val hi = end.asInstanceOf[Pos].v
    if (hi <= lo) Array.empty
    else {
      // Re-slice the admitted range so a micro-batch reads with the same
      // parallelism as the batch scan, not one task per trigger.
      val per = math.max(1L, (hi - lo + numPartitions - 1) / numPartitions)
      (lo until hi by per)
        .map(l => GenPartition(l, math.min(l + per, hi)): InputPartition)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(fields)
}

private[sources] case class GenPartition(lo: Long, hi: Long) extends InputPartition

private[sources] class GenReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.lo - 1
      override def next(): Boolean = { cur += 1; cur < p.hi }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "id" => cur
          case "val" => GenSource.valOf(cur)
        })
      override def close(): Unit = ()
    }
  }
}
