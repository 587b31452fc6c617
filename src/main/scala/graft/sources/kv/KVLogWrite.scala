package graft.sources.kv

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{MessageType, PrimitiveType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation.stringType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._

/** DataSourceV2 batch APPEND for a graft KV table: SQL
  * `INSERT INTO graft.(...)` lands rows in the table's append log —
  * exactly the `put` semantics (write/KVStore.scala:126, the
  * reference's buffered-mutator upsert, HBaseTable.scala:100-155) —
  * so catalog-resolved tables are writable without going around the
  * catalog to the library API.
  *
  * Commit protocol (the same two-phase shape as Spark's file sources):
  * every task writes its own parquet file under a dot-prefixed
  * inflight directory — invisible to readers, which list only
  * non-hidden plain files ([[GraftFs.dataFiles]]) — and job commit
  * moves the committed tasks' files into `log/` one rename each.
  * A reader racing the commit sees a prefix of the files (each is a
  * complete parquet file, and cell appends are order-independent —
  * latest-wins resolves on `ts`, not file order); failed or
  * speculative task attempts die in the inflight dir and are removed
  * by commit/abort cleanup. On HDFS the renames are namenode-atomic;
  * the S3 story is the same one the pointer protocol documents
  * ([[GraftFs]] scheme notes).
  */
class KVWriteBuilder(path: String, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new KVLogWrite(path, info.queryId())
}

class KVLogWrite(path: String, queryId: String) extends Write with BatchWrite {
  private val logDir = s"$path/log"
  protected val inflightDir: String = s"$logDir/.inflight-$queryId"
  private def inflight = inflightDir

  override def toBatch: BatchWrite = this
  override def description(): String = s"graft-kv append `$path`"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KVLogWriterFactory(inflight)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    GraftFs.mkdirs(logDir)
    messages.foreach { case KVLogFile(name) =>
      GraftFs.move(s"$inflight/$name", s"$logDir/$name")
    }
    GraftFs.delete(inflight, recursive = true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    GraftFs.delete(inflight, recursive = true): Unit
  }
}

case class KVLogFile(name: String) extends WriterCommitMessage

class KVLogWriterFactory(inflight: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KVLogDataWriter(inflight, partitionId, taskId)
}

/** One task = one parquet file of cells, written row-wise through
  * parquet-mr (appends are memstore-sized by contract — the bulk path
  * is compaction, which writes through Spark's own vectorized parquet
  * sink). The file schema matches what `KVTable.put` produces via
  * Spark's parquet writer (optional int64 / UTF8 binary), so both
  * readers decode log files identically regardless of which write
  * path appended them. */
class KVLogDataWriter(inflight: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  import KVLogDataWriter._

  private val name = f"part-$partitionId%05d-$taskId.parquet"
  private val writer = openCellWriter(s"$inflight/$name")
  private val groups = new SimpleGroupFactory(CELL_TYPE)

  override def write(row: InternalRow): Unit =
    writer.write(cellGroup(groups, row, 0))

  override def commit(): WriterCommitMessage = { writer.close(); KVLogFile(name) }
  override def abort(): Unit = writer.close()
  override def close(): Unit = ()
}

object KVLogDataWriter {
  private def str(n: String): PrimitiveType =
    Types.optional(PrimitiveTypeName.BINARY).as(stringType()).named(n)
  private def i64(n: String): PrimitiveType =
    Types.optional(PrimitiveTypeName.INT64).named(n)

  /** Parquet shape of `KVTable.CELL_SCHEMA_DDL`. */
  val CELL_TYPE: MessageType = new MessageType("graft_cells",
    i64("key"), str("family"), str("qualifier"), str("value"),
    i64("ts"), str("tomb"))

  /** Open a parquet-mr writer over [[CELL_TYPE]] — snappy, the codec
    * Spark's parquet sink defaults to, so cell files read identically
    * whichever write path produced them. */
  private[kv] def openCellWriter(
      file: String): org.apache.parquet.hadoop.ParquetWriter[
        org.apache.parquet.example.data.Group] = {
    val conf = new Configuration(false)
    GroupWriteSupport.setSchema(CELL_TYPE, conf)
    ExampleParquetWriter.builder(new HPath(file))
      .withConf(conf)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
  }

  /** THE cell→parquet-group encoding (field order = [[CELL_TYPE]]).
    * Every cell writer — log append and CoW generation alike — encodes
    * through this one mapping, or generations and log files would
    * diverge on a schema change. `off` = index of `key` in the row. */
  private[kv] def cellGroup(groups: SimpleGroupFactory, row: InternalRow,
                            off: Int): org.apache.parquet.example.data.Group = {
    val g = groups.newGroup()
    if (!row.isNullAt(off)) g.append("key", row.getLong(off))
    if (!row.isNullAt(off + 1)) g.append("family", row.getUTF8String(off + 1).toString)
    if (!row.isNullAt(off + 2)) g.append("qualifier", row.getUTF8String(off + 2).toString)
    if (!row.isNullAt(off + 3)) g.append("value", row.getUTF8String(off + 3).toString)
    if (!row.isNullAt(off + 4)) g.append("ts", row.getLong(off + 4))
    if (!row.isNullAt(off + 5)) g.append("tomb", row.getUTF8String(off + 5).toString)
    g
  }
}
