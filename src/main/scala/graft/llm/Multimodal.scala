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

  /** Frame sampling over an opaque "video" payload: slice the binary
    * into fixed-size frames, keep every `stride`-th one, one output row
    * per sampled frame. The slicing is pure column algebra (substr on
    * binary + posexplode), so it parallelizes per row and never
    * materializes the un-sampled frames. */
  def frameSample(blobs: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    blobs
      .withColumn("n_frames", floor(length(col("payload")) / frameBytes).cast("int"))
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
          lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1,
          lit(frameBytes)).as("frame"))

  /** Feature-extraction stub: a fixed-width float vector derived from
    * the frame bytes (deterministic fake — a real deployment calls an
    * image/audio encoder here; schema and batching stay identical). */
  def extractFeatures(frames: DataFrame, dims: Int = 4): DataFrame =
    frames.withColumn("features", transform(
      sequence(lit(1), lit(dims)),
      i => conv(hex(col("frame")).substr(i, lit(2)), 16, 10).cast("long")
        / 255.0))
}
