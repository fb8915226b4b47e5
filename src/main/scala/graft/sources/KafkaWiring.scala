package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}

/** Plan-level wiring for the reference's Kafka boundary: its durability
  * story IS the broker (reference README.md:19–23 — "a log-based message
  * broker which retains messages on disk ... maintains the last committed
  * message offset for each consumer"), with the producer and consumer in
  * separate graphs (README.md:21, images/producer.png) so the generator
  * outlives consumer failures.
  *
  * The consumer panel (images/KafkaConsumerAtMostOnceConfig.png,
  * …AtLeastOnceConfig.png, …ExactlyOnceConfig.png) maps onto Spark's Kafka
  * source options as follows:
  *
  *  - Topics                → `subscribe`
  *  - Group ID              → `kafka.group.id` (README.md:118's new-group-
  *                            restarts-from-the-beginning trick works the
  *                            same way — with a fresh checkpoint dir)
  *  - Offset: oldest/newest → `startingOffsets` earliest/latest
  *  - Max messages (bytes)  → `kafka.fetch.max.bytes`
  *  - Max wait time         → `kafka.fetch.max.wait.ms`
  *  - poll limit            → `maxOffsetsPerTrigger` (bounds a micro-batch)
  *  - Auto commit           → deliberately NOT forwarded: Spark's Kafka
  *    source rejects `enable.auto.commit` — offsets are tracked in the
  *    STREAM CHECKPOINT and advance only when the batch is durably
  *    processed, which is precisely the ack-port discipline the reference
  *    builds by hand (README.md:106–108: "the HANA Client needs to
  *    explicitly tell Kafka when it has finished processing a message").
  *    Delivery semantics are then chosen by the sink (see
  *    graft.streaming.DeliverySemantics), not by a commit flag.
  *
  * The container ships no Kafka connector jar and no broker, so tests
  * validate the option mapping and the record↔envelope adapters (the Kafka
  * source's fixed output schema is public API and reproducible offline);
  * [[consumer]]/[[producer]] return fully-configured builders that
  * `.load()`/`.start()` against a real cluster unchanged.
  */
object KafkaWiring {

  /** The Kafka Consumer operator's config panel, field for field. */
  case class ConsumerPanel(
      brokers: String,
      topics: Seq[String],
      groupId: String,
      offset: String = "oldest", // "oldest" | "newest" | JSON offsets
      maxMessageBytes: Long = 1000000L, // panel "Max messages (bytes)"
      maxWaitMs: Long = 500L, // panel "Max wait time"
      pollLimit: Option[Long] = None) // per-trigger message cap

  /** The Kafka Producer operator's config (images/producer.png). */
  case class ProducerPanel(brokers: String, topic: String)

  def consumerOptions(p: ConsumerPanel): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> p.brokers,
      "subscribe" -> p.topics.mkString(","),
      "kafka.group.id" -> p.groupId,
      "startingOffsets" -> (p.offset match {
        case "oldest" => "earliest"
        case "newest" => "latest"
        case json => json // per-partition JSON offsets pass through
      }),
      "kafka.fetch.max.bytes" -> p.maxMessageBytes.toString,
      "kafka.fetch.max.wait.ms" -> p.maxWaitMs.toString
    ) ++ p.pollLimit.map("maxOffsetsPerTrigger" -> _.toString)

  def producerOptions(p: ProducerPanel): Map[String, String] =
    Map("kafka.bootstrap.servers" -> p.brokers, "topic" -> p.topic)

  /** Configured (unresolved) consumer: `.load()` on a cluster with the
    * Kafka connector yields the source's fixed schema
    * (key/value/topic/partition/offset/timestamp/timestampType).
    */
  def consumer(spark: SparkSession, p: ConsumerPanel): DataStreamReader =
    spark.readStream.format("kafka").options(consumerOptions(p))

  /** Configured producer over key/value-shaped rows: `.start()` publishes
    * to `p.topic`.
    */
  def producer(records: DataFrame, p: ProducerPanel,
      checkpoint: String): DataStreamWriter[Row] =
    records.writeStream.format("kafka").options(producerOptions(p))
      .option("checkpointLocation", checkpoint)

  /** Shape a generator stream into Kafka producer records: the sensor CSV
    * body becomes `value`, the monotonic counter the partition `key` —
    * exactly what the Data Generator → Kafka Producer edge carries
    * (README.md:21–23, 88).
    */
  def toProducerRecords(df: DataFrame, keyCol: String,
      bodyCol: String): DataFrame =
    df.select(col(keyCol).cast("string").as("key"),
      col(bodyCol).cast("string").as("value"))

  /** Kafka source records → the reference's message envelope: CSV `value`
    * becomes the `body`, broker coordinates become the attribute columns
    * the commit token `topic/partition/offset` is minted from
    * (images/wiretapAtMostOnce.png via [[Envelope.withCommitToken]]).
    */
  def fromKafkaRecords(records: DataFrame): DataFrame =
    records.select(
      col("value").cast("string").as("body"),
      col("topic"), col("partition"), col("offset"),
      col("timestamp").as("kafka_ts"))
}
