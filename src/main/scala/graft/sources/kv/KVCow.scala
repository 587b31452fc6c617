package graft.sources.kv

import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** GROUP-BASED (copy-on-write) row-level operations on a graft KV
  * table — the second canonical strategy next to the delta/merge-on-read
  * default ([[KVRowLevelOperation]]), selected per session with
  * `SET spark.graft.kv.rowlevel=cow`.
  *
  * Semantics: the operation's scan is the RESOLVED live state (same
  * [[KVResolvedScan]] as the delta path), Spark's ReplaceData plan
  * computes the complete post-operation contents (carried-over rows +
  * merge outputs, minus deletes), and the write lands it as a FRESH
  * GENERATION behind the atomic pointer flip — exactly a compaction
  * whose input had the mutation applied. Where the delta path appends
  * versions and tombstones (write-optimized: O(changed rows) written,
  * history retained, resolve cost on read), CoW pays the full rewrite
  * once and reads are then tombstone-free and maximally compact
  * (read-optimized) — the Iceberg/Delta MoR-vs-CoW tradeoff, both
  * sides of which this source now implements.
  *
  * Scale/correctness contract:
  *  - The CoW scan accepts NO pushdown and NO bucket pruning: its
  *    output IS the replacement table contents, so any scan-level
  *    dropping of rows would silently delete them. Spark applies the
  *    command's predicates above the scan. (Group granularity here is
  *    the whole table; per-bucket group filtering is the delta path's
  *    job — a MERGE that touches few rows should use MoR anyway.)
  *  - The write requires a distribution CLUSTERED BY `key` into
  *    exactly `numBuckets` partitions and (key, family, qualifier)
  *    ordering — Spark's hash-clustering into N partitions places a
  *    row in partition `pmod(murmur3(key), N)`, which is bit-for-bit
  *    Spark's own `bucketBy` placement ([[GraftBucket]],
  *    BucketingSpec), so partition id == bucket id and each task
  *    writes its bucket's sorted file directly. Every row is verified
  *    against [[GraftBucket.of]] at write time — a placement drift
  *    fails the job loudly instead of corrupting the layout.
  *  - Two-phase commit: tasks write into a dot-prefixed inflight dir
  *    (invisible to readers); job commit moves files into
  *    `compacted/gen-<N+1>`, registers the bucketed catalog table over
  *    that location, and runs the shared publish tail
  *    (`KVTable.publishGeneration`): completeness marker → pointer
  *    flip → snapshot log-file retirement → N-1 pruning. Appends
  *    racing the rewrite survive exactly as they do under compaction —
  *    only the scan snapshot's log files are retired.
  */
class KVCowBuilder(path: String, info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new KVCowOperation(path, info.command)
}

class KVCowOperation(path: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {
  // ONE layout snapshot shared by scan and write: the write retires
  // exactly the log files the scan consumed, never a racing append's
  private[kv] lazy val layout: KVLayout = KVLayout(path)

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft-kv-cow $cmd `$path`"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KVCowScanBuilder(path, layout)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new KVCowWrite(path, layout, info)
    }
}

/** Resolved scan with NO pushdown surface: the scan output is the
  * replacement content, so nothing may be dropped below it. */
class KVCowScanBuilder(path: String, layout: KVLayout) extends ScanBuilder {
  override def build(): org.apache.spark.sql.connector.read.Scan =
    new KVResolvedScan(path, layout, KVBatchTable.CELL_SCHEMA,
      Array.empty[Filter])
}

class KVCowWrite(path: String, layout: KVLayout, info: LogicalWriteInfo)
    extends Write with BatchWrite with RequiresDistributionAndOrdering {
  require(info.schema().fieldNames.sameElements(
    KVBatchTable.CELL_SCHEMA.fieldNames),
    s"CoW replace schema ${info.schema().fieldNames.mkString(",")} does " +
      "not match the cell schema")

  private val numBuckets = if (layout.bucketed) layout.numBuckets else 8
  private val inflight = s"$path/compacted/.inflight-${info.queryId()}"

  override def toBatch: BatchWrite = this
  override def description(): String = s"graft-kv-cow-write `$path`"

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.column("key")))
  override def requiredNumPartitions(): Int = numBuckets
  override def requiredOrdering(): Array[SortOrder] = Array(
    Expressions.sort(Expressions.column("key"), SortDirection.ASCENDING),
    Expressions.sort(Expressions.column("family"), SortDirection.ASCENDING),
    Expressions.sort(Expressions.column("qualifier"), SortDirection.ASCENDING))

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KVCowWriterFactory(inflight, numBuckets)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val t = graft.write.KVTable(spark, path)
    val newGen = t.nextGen
    val genDir = s"$path/compacted/gen-$newGen"
    GraftFs.mkdirs(genDir)
    messages.foreach {
      case KVCowFile(name) if name.nonEmpty =>
        GraftFs.move(s"$inflight/$name", s"$genDir/$name")
      case _ => ()
    }
    GraftFs.delete(inflight, recursive = true)
    t.registerGenerationTable(newGen, numBuckets)
    t.publishGeneration(newGen, numBuckets, layout.logFiles)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    GraftFs.delete(inflight, recursive = true): Unit
  }
}

case class KVCowFile(name: String) extends WriterCommitMessage

class KVCowWriterFactory(inflight: String, numBuckets: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KVCowDataWriter(inflight, numBuckets, partitionId, taskId)
}

/** One task = one bucket = one sorted parquet file, named with the
  * Spark bucket-file suffix (`..._00003.c000...`) so both the bucketed
  * catalog table and [[KVLayout]]'s listing attribute it to its bucket.
  * Rows stream through parquet-mr in arrival (= required sort) order;
  * the writer is created lazily so empty buckets produce no file. */
class KVCowDataWriter(inflight: String, numBuckets: Int,
                      partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  import KVLogDataWriter.CELL_TYPE

  private val name =
    f"part-$partitionId%05d-$taskId" + f"_$partitionId%05d.c000.snappy.parquet"
  private var writer: org.apache.parquet.hadoop.ParquetWriter[
    org.apache.parquet.example.data.Group] = _
  private lazy val groups = new SimpleGroupFactory(CELL_TYPE)

  override def write(row: InternalRow): Unit = {
    if (writer == null)
      writer = KVLogDataWriter.openCellWriter(s"$inflight/$name")
    // ReplaceData's physical rows may carry the planner's OPERATION
    // column (RowDeltaUtils: 5=WRITE, 6=WRITE_WITH_METADATA) ahead of
    // the cell columns — Spark's plain writing task hands the row
    // through un-projected. Accept both layouts, refuse anything else.
    val off = row.numFields match {
      case 6 => 0
      case 7 if !row.isNullAt(0) && (row.getInt(0) == 5 || row.getInt(0) == 6) => 1
      case n => throw new IllegalStateException(
        s"unexpected CoW replace-row layout: $n fields, " +
          s"first=${if (row.isNullAt(0)) "null" else row.getInt(0).toString}")
    }
    // loud failure beats silent layout corruption: the clustering
    // contract (partition id == bucket id) is verified per row
    if (!row.isNullAt(off)) {
      val b = GraftBucket.of(row.getLong(off), numBuckets)
      if (b != partitionId) throw new IllegalStateException(
        s"CoW clustering drift: key ${row.getLong(off)} belongs to bucket " +
          s"$b but arrived in write partition $partitionId")
    }
    writer.write(KVLogDataWriter.cellGroup(groups, row, off))
  }

  override def commit(): WriterCommitMessage =
    if (writer == null) KVCowFile("")
    else { writer.close(); KVCowFile(name) }
  override def abort(): Unit = if (writer != null) writer.close()
  override def close(): Unit = ()
}
