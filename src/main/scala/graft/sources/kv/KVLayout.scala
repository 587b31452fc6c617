package graft.sources.kv

import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.types.LongType

/** On-disk layout of a graft KV table (the engine's HBase-table
  * analogue, see write/KVStore.scala): `<path>/compacted` holds the
  * bucketed, key-sorted resolved state (one-or-more parquet files per
  * bucket, Spark bucket id encoded in the file name) in per-generation
  * directories behind the `_graft_current.txt` pointer; `<path>/log`
  * holds post-compaction appends (the memstore analogue) as plain
  * parquet. This mirrors what the reference derives from HBase region
  * metadata at scan-planning time (HBaseRDD.scala:18-38: one partition
  * per region, region boundaries from the cluster) — here the "regions"
  * are hash buckets and the metadata is the directory itself.
  *
  * Snapshotted driver-side at scan-planning time; the file lists ride
  * into the input partitions, so a compaction racing with a running
  * query cannot change which files a task reads.
  */
case class KVLayout(path: String) {
  private def dataFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(f => f.isFile &&
      !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(_.getPath).sorted.toSeq
  }

  /** (generation, numBuckets) via the shared pointer reader
    * ([[KVPointer]]) — compaction publishes a new `compacted/gen-<N>`
    * directory by atomically flipping the pointer, and the previous
    * generation survives one more compaction interval so in-flight
    * scans (which snapshotted its file list) keep reading valid files
    * through the swap. */
  private val current: Option[(Int, Int)] = KVPointer.read(path)

  /** Bucket count of the compacted state, or -1 if never compacted. */
  val numBuckets: Int = current.map(_._2).getOrElse(-1)

  val logFiles: Seq[String] = dataFiles(s"$path/log")

  /** Current generation's compacted files keyed by the bucket id in
    * their Spark bucket-file name (`part-...-_00003.c000...`). */
  val compactedByBucket: Map[Int, Seq[String]] = current match {
    case None => Map.empty
    case Some((g, _)) =>
      val pat = "_(\\d{5})\\.".r
      dataFiles(s"$path/compacted/gen-$g")
        .flatMap(f => pat.findFirstMatchIn(new java.io.File(f).getName)
          .map(m => m.group(1).toInt -> f))
        .groupBy(_._1).map { case (b, fs) => b -> fs.map(_._2) }
  }

  def bucketed: Boolean = numBuckets > 0
  def exists: Boolean = bucketed || logFiles.nonEmpty

  def totalBytes: Long =
    (compactedByBucket.values.flatten ++ logFiles)
      .map(f => new java.io.File(f).length()).sum
}

/** The bucket-assignment function of the compacted layout. MUST agree
  * bit-for-bit with how Spark's `bucketBy` placed the rows — i.e.
  * `pmod(murmur3(key, seed=42), n)` — because the scan merges log rows
  * into the bucket partition that the compacted layout put their key
  * in. Delegates to Spark's own Murmur3 so there is no second
  * implementation to drift. */
object GraftBucket {
  def of(key: Any, numBuckets: Int): Int = {
    val h = if (key == null) 42
      else Murmur3HashFunction.hash(key, LongType, 42L).toInt
    val m = h % numBuckets
    if (m < 0) m + numBuckets else m
  }
}
