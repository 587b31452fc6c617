package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary-column) processing plumbing (builder-prompt
  * north-star): images/audio/video ride through the engine as opaque
  * `binary` columns plus typed metadata; decode / feature-extraction
  * runs batch-wise per partition.
  *
  * The Spark-side shape is real — schema, partition-parallel batched
  * decode over `mapPartitions`, typed output rows; the *decoder itself*
  * is a STUB (this container has no image/audio libraries): it derives
  * deterministic fake metadata from the payload's leading bytes. A real
  * deployment swaps `decodeStub` for an actual codec call; nothing else
  * changes.
  */
object Multimodal {

  case class BlobRow(doc_id: Long, payload: Array[Byte])
  case class Decoded(doc_id: Long, width: Long, height: Long, format: String)

  private val FORMATS = Array("jpeg", "png", "webp")

  /** STUB decoder — deterministic fake: metadata from leading payload
    * bytes. Replace with a real image/audio decode in production. */
  def decodeStub(b: BlobRow): Decoded = {
    val p = b.payload
    Decoded(b.doc_id,
      width = (p(0) & 0xff).toLong,
      height = (p(1) & 0xff).toLong,
      format = FORMATS((p(2) & 0xff) % FORMATS.length))
  }

  /** Batched partition-parallel decode: the iterator is consumed lazily
    * per partition (constant memory), exactly how a vectorized decode
    * over image batches runs at scale. */
  def decode(blobs: Dataset[BlobRow]): Dataset[Decoded] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(decodeStub))
  }

  /** documents → fake binary payloads (md5 of the text as 16 "image"
    * bytes) with the metadata column layout a real pipeline carries. */
  def blobTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), unhex(md5(col("text"))).as("payload"),
      length(col("text")).cast("long").as("payload_src_chars"))
}
