package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSourceV2 batch SINK — the write half of the custom-source tier
  * (`GenSource` is the read half): rows stream through executor-side
  * `DataWriter`s that fold them into an order-independent digest
  * (count / xor / sum of the portable md5-head hash, the q112 checksum
  * algebra), task commits ship ONLY the three-number
  * `WriterCommitMessage`, and the driver-side `BatchWrite.commit`
  * combines them and publishes one JSON line via write-temp-then-rename.
  * This is the whole two-phase commit protocol a real connector (JDBC,
  * object store, index service) rides: speculative/retried tasks may each
  * produce a message, but only the ONE message per task Spark hands to
  * `commit` is folded, so duplicated task attempts cannot double-count —
  * and nothing row-sized ever reaches the driver.
  *
  * Input contract: a single string column `m` (the row's md5 hex digest,
  * prepared by the query — the sink hashes positionally exactly like
  * `PortableHash.hexHeadToLong`, so a DuckDB oracle reproduces it).
  */
class DigestSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DigestSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DigestTable(properties.get("out"))
}

object DigestSink {
  val schema: StructType = StructType(Seq(StructField("m", StringType)))

  /** JVM mirror of PortableHash.hexHeadToLong: first 12 hex digits → [0, P).
    * Contract-checked: a null or short row fails with the sink's message,
    * not an executor StringIndexOutOfBounds (the source/sink error-isolation
    * discipline — see Validate). */
  def headToLong(md5Hex: String): Long = {
    require(md5Hex != null && md5Hex.length >= 12,
      s"DigestSink expects md5-hex rows (>= 12 hex chars), got " +
        (if (md5Hex == null) "null" else s"'$md5Hex'"))
    java.lang.Long.parseLong(md5Hex.substring(0, 12), 16) % 4294967291L
  }

  final case class Digest(n: Long, xor: Long, sum: Long)
      extends WriterCommitMessage
}

private[sources] class DigestTable(out: String) extends Table with SupportsWrite {
  require(out != null, "DigestSink requires an 'out' option (result path)")
  override def name(): String = s"graft_digest($out)"
  override def schema(): StructType = DigestSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().length == 1 &&
      info.schema().head.dataType == StringType,
      s"DigestSink expects one string column, got ${info.schema()}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new DigestBatchWrite(out)
      }
    }
  }
}

private[sources] class DigestBatchWrite(out: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DigestWriterFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ds = messages.map(_.asInstanceOf[DigestSink.Digest])
    val n = ds.map(_.n).sum
    val xor = ds.map(_.xor).foldLeft(0L)(_ ^ _)
    val sum = ds.map(_.sum).sum
    val path = java.nio.file.Paths.get(out)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp,
      s"""{"n_rows": $n, "xor_digest": $xor, "sum_digest": $sum}""")
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class DigestWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L
      private var xor = 0L
      private var sum = 0L
      override def write(row: InternalRow): Unit = {
        val h = DigestSink.headToLong(row.getString(0))
        n += 1; xor ^= h; sum += h
      }
      override def commit(): WriterCommitMessage = DigestSink.Digest(n, xor, sum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
