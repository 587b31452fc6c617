package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.write.KVTable

/** Streaming cell ingest with a pluggable transport (reference
  * KafkaProxy.scala:12-33: a Kafka proxy feeding the same table-merge
  * path as its socket DStream). Every transport yields the same shape —
  * one `value: String` column of CSV cell lines
  * `key,family,qualifier,value,ts` — and every transport feeds the ONE
  * foreachBatch → [[KVTable.put]] merge, so switching socket → Kafka in
  * production is a config change, not a pipeline rewrite.
  *
  * The Kafka branch is plain config wiring over Spark's built-in
  * `format("kafka")` source (needs the spark-sql-kafka connector on the
  * classpath at runtime; there is no broker in the test sandbox, so
  * specs drive the shared merge through the socket branch —
  * IngestSpec).
  */
object Ingest {

  sealed trait StreamSource
  /** Kafka topic of cell lines (value bytes = CSV line). */
  case class KafkaSource(bootstrapServers: String, topic: String,
                         startingOffsets: String = "earliest") extends StreamSource
  /** Line-per-cell text socket (the reference's original transport). */
  case class SocketSource(host: String, port: Int) extends StreamSource
  /** Staged landing directory of text files, one cell line per row. */
  case class FileSource(dir: String) extends StreamSource

  /** Config-gated construction: `format` selects the transport, the
    * rest parameterizes it. Unknown formats fail fast. */
  def fromConf(conf: Map[String, String]): StreamSource =
    conf.getOrElse("format", "socket") match {
      case "kafka" => KafkaSource(conf("kafka.bootstrap.servers"),
        conf("topic"), conf.getOrElse("startingOffsets", "earliest"))
      case "socket" => SocketSource(conf("host"), conf("port").toInt)
      case "file" => FileSource(conf("dir"))
      case other => throw new IllegalArgumentException(
        s"unknown stream format '$other' (kafka | socket | file)")
    }

  /** The transport-normalized stream: `value: String` cell lines.
    *
    * VALIDATION STATUS of the kafka leg (carried since round 5, checked
    * again round 8): it cannot be exercised in this sandbox, even
    * against an embedded broker. Evidence: `/opt/spark/jars` ships no
    * `spark-sql-kafka` connector and no kafka-clients/kafka-server
    * artifact; the coursier cache (COURSIER_MODE=offline, zero egress)
    * holds only sbt/scalatest/scalacheck/duckdb jars — `find / -name
    * '*kafka*.jar'` over the whole filesystem returns nothing, so
    * neither the connector nor an embeddable broker class exists to
    * load. The branch is therefore config wiring over Spark's own
    * `format("kafka")` reader — everything downstream of `.load()` (the
    * value-cast, the CSV cell parse, `mergeInto`'s KV upsert) is the
    * SAME code path the socket and file transports drive, and those are
    * validated end-to-end (SocketStreamSpec, s7_stream_agg). The
    * reference itself pipes Kafka through a socket proxy
    * (KafkaProxy.scala:12-33), so the socket-validated path is also the
    * reference-parity path. */
  /** The exact reader options the kafka leg passes to
    * `format("kafka")` — split out so the option plumbing is a unit-
    * testable contract even where no broker or connector can load. */
  def kafkaReaderOptions(src: KafkaSource): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> src.bootstrapServers,
    "subscribe" -> src.topic,
    "startingOffsets" -> src.startingOffsets)

  /** Kafka record batch → the transport-normalized `value: String`
    * shape. Input carries Spark's kafka source schema (key/value
    * BINARY plus topic/partition/offset/timestamp metadata); the cell
    * line is the UTF-8 value bytes. Pure column logic, so the contract
    * is testable on a synthetic kafka-shaped frame. */
  def normalizeKafka(records: DataFrame): DataFrame =
    records.select(col("value").cast("string").as("value"))

  def lines(spark: SparkSession, src: StreamSource): DataFrame = src match {
    case k: KafkaSource =>
      normalizeKafka(spark.readStream.format("kafka")
        .options(kafkaReaderOptions(k))
        .load())
    case SocketSource(host, port) =>
      spark.readStream.format("socket")
        .option("host", host).option("port", port).load()
    case FileSource(dir) =>
      spark.readStream.text(dir).withColumnRenamed("text", "value")
  }

  /** The shared merge every transport funnels into: parse CSV cell
    * lines, append to the KV log (upsert-by-log — no read on the write
    * path, the BufferedMutator analogue). Returns the running query;
    * callers own its lifecycle. */
  def mergeInto(table: KVTable, cellLines: DataFrame): StreamingQuery =
    cellLines.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val f = split(col("value"), ",")
        table.put(batch.select(
          f.getItem(0).cast("long").as("key"),
          f.getItem(1).as("family"),
          f.getItem(2).as("qualifier"),
          f.getItem(3).as("value"),
          f.getItem(4).cast("long").as("ts")))
      }.start()

  /** One-call ingest: conf → transport → shared merge. */
  def run(spark: SparkSession, table: KVTable,
          conf: Map[String, String]): StreamingQuery =
    mergeInto(table, lines(spark, fromConf(conf)))
}
