package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming exact-dedup at ingest (beyond the reference's streaming
  * surface, SURVEY.md §2.10): at-least-once delivery made exactly-once
  * by key, with state BOUNDED BY THE WATERMARK rather than by corpus
  * size — the property that separates this from a naive streaming
  * `dropDuplicates`, whose state grows one entry per key ever seen and
  * dies first at 100 TB.
  *
  * `dropDuplicatesWithinWatermark(keys)` keeps the first arrival of
  * each key and drops any duplicate arriving while the key is still in
  * state; the state store evicts a key once the watermark passes its
  * event time + `horizon`, so steady-state memory is O(events per
  * horizon window) per partition. `horizon` is therefore the dedup
  * CONTRACT: a re-delivery later than the horizon is indistinguishable
  * from a new event. Ingest pipelines pick it from the delivery
  * guarantee of the upstream bus (e.g. a Kafka retention window), not
  * from corpus size.
  */
object StreamDedup {

  /** Drive the staged directory through the dedup and land surviving
    * rows in `outDir` as parquet — a distributed file sink (plus its
    * streaming checkpoint for exactly-once restart), NOT a driver
    * memory sink; the read-back is a plain parquet scan. */
  def run(spark: SparkSession, stageDir: String, schema: StructType,
          outDir: String, checkpointDir: String, keys: Seq[String],
          eventTimeCol: String, horizon: String): DataFrame = {
    val deduped = spark.readStream.schema(schema).parquet(stageDir)
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark(keys)
    val q = deduped.writeStream.outputMode("append")
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.schema(deduped.schema).parquet(outDir)
  }
}
