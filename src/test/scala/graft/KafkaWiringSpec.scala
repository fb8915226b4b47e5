package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.sources.{Envelope, KafkaWiring, SensorGenerator}
import graft.sources.KafkaWiring.{ConsumerPanel, ProducerPanel}

/** Offline validation of the Kafka boundary wiring: the option mapping
  * from the reference's consumer/producer panels, and the record↔envelope
  * adapters over the Kafka source's fixed public schema. No broker and no
  * connector jar in the container — `.load()`/`.start()` are exercised on
  * a real cluster, everything up to them here.
  */
class KafkaWiringSpec extends SparkSpec {

  // the at-least-once panel, field for field
  // (reference images/KafkaConsumerAtLeastOnceConfig.png)
  private val panel = ConsumerPanel(
    brokers = "broker:9092",
    topics = Seq("my_sensors_data"),
    groupId = "sensors_group_test_1",
    offset = "oldest",
    maxMessageBytes = 1000000L,
    maxWaitMs = 500L)

  test("consumer panel maps onto Spark Kafka source options") {
    val opts = KafkaWiring.consumerOptions(panel)
    assert(opts("subscribe") === "my_sensors_data")
    assert(opts("kafka.group.id") === "sensors_group_test_1")
    assert(opts("startingOffsets") === "earliest") // Offset: oldest
    assert(opts("kafka.fetch.max.bytes") === "1000000")
    assert(opts("kafka.fetch.max.wait.ms") === "500")
    assert(opts("kafka.bootstrap.servers") === "broker:9092")
    // auto-commit must never be forwarded: offsets live in the checkpoint
    assert(!opts.keys.exists(_.toLowerCase.contains("auto.commit")), opts)
    assert(!opts.contains("maxOffsetsPerTrigger"))
  }

  test("offset newest → latest; JSON offsets pass through; poll limit caps the trigger") {
    val newest = KafkaWiring.consumerOptions(panel.copy(offset = "newest"))
    assert(newest("startingOffsets") === "latest")
    val json = """{"my_sensors_data":{"0":42}}"""
    assert(KafkaWiring.consumerOptions(panel.copy(offset = json))(
      "startingOffsets") === json)
    val capped = KafkaWiring.consumerOptions(panel.copy(
      pollLimit = Some(1000L)))
    assert(capped("maxOffsetsPerTrigger") === "1000")
  }

  test("multiple topics subscribe comma-joined") {
    val opts = KafkaWiring.consumerOptions(panel.copy(
      topics = Seq("a", "b")))
    assert(opts("subscribe") === "a,b")
  }

  test("consumer/producer builders configure without a broker") {
    // construction is plan-level: no connection is attempted until
    // .load()/.start(), so this must not throw
    KafkaWiring.consumer(spark, panel)
    // producer graph: unbounded generator → CSV body → kafka records
    val records = KafkaWiring.toProducerRecords(
      SensorGenerator.toCsvBody(SensorGenerator.stream(spark)),
      "key", "body")
    assert(records.isStreaming)
    KafkaWiring.producer(records, ProducerPanel("broker:9092", "t"),
      "/tmp/ckpt_unused")
  }

  test("producer records: counter keys the partition, CSV body is the value") {
    val recs = KafkaWiring.toProducerRecords(
      SensorGenerator.toCsvBody(SensorGenerator.batch(spark, 3, 5)),
      "key", "body").orderBy("key")
    assert(recs.schema.fieldNames.toSeq === Seq("key", "value"))
    assert(recs.schema.fields.forall(_.dataType == StringType))
    val rows = recs.collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("5", "6", "7"))
    assert(rows.forall(r => r.getString(1).startsWith(r.getString(0) + ",")))
    assert(KafkaWiring.producerOptions(ProducerPanel("b:9092", "t")) ===
      Map("kafka.bootstrap.servers" -> "b:9092", "topic" -> "t"))
  }

  test("kafka records → envelope → parsed body + commit token") {
    // the Kafka source's fixed output schema, reproduced statically
    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    val body = SensorGenerator.toCsvBody(SensorGenerator.batch(spark, 1, 3))
      .collect().head.getString(1)
    val rows = java.util.Arrays.asList(Row(
      "3".getBytes("UTF-8"), body.getBytes("UTF-8"), "my_sensors_data",
      0, 3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0))
    val records = spark.createDataFrame(rows, kafkaSchema)
    val env = Envelope.withCommitToken(KafkaWiring.fromKafkaRecords(records))
    val parsed = Envelope.parseBody(env).collect().head
    assert(parsed.getAs[String]("commit_token") === "my_sensors_data/0/3")
    assert(parsed.getAs[Int]("counter") === 3)
    // the parsed sensor columns equal the generator's row for counter 3
    val want = SensorGenerator.batch(spark, 1, 3).collect().head
    assert(parsed.getAs[Double]("temperature") ===
      want.getAs[Double]("temperature"))
    assert(parsed.getAs[Int]("deviceid") === want.getAs[Int]("deviceid"))
  }
}
