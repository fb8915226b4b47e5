package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.sources.SensorGenerator
import graft.streaming.DeliverySemantics

/** The reference's Simulate Error experiment (README.md:45–63, 80–82) as a
  * streaming test: arm a fault, let it kill the query mid-stream, restart
  * from the same checkpoint, and assert the exactly-once outcome
  * (README.md:159–164: no loss, no duplicates).
  */
class StreamingRestartSpec extends SparkSpec {

  test("crash mid-stream + restart from checkpoint => exactly-once table") {
    val base = Files.createTempDirectory("graft_restart").toString
    val srcDir = s"$base/src"
    val ckpt = s"$base/ckpt"
    val target = s"$base/target"
    // four source files of 25 contiguous counters each
    (0 until 4).foreach { i =>
      SensorGenerator.batch(spark, 25, i * 25L)
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    val schema = spark.read.parquet(srcDir).schema
    def start(crashAtBatch: Option[Long]) = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      stream.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          if (crashAtBatch.contains(id))
            sys.error("unexpected value received") // the Simulate Error kill
          DeliverySemantics.parquetUpsertSink(spark, target,
            "counter", "counter")(batch, id)
        }
        .start()
    }
    // run 1: dies on batch 2 (batches 0 and 1 are committed)
    val q1 = start(crashAtBatch = Some(2))
    intercept[Exception] { q1.awaitTermination() }
    val afterCrash = spark.read.parquet(target).count()
    assert(afterCrash === 50L, "two micro-batches landed before the crash")
    // run 2: same checkpoint, fault disarmed → resumes at batch 2
    val q2 = start(crashAtBatch = None)
    q2.awaitTermination()
    val audit = DeliverySemantics
      .auditGaps(spark.read.parquet(target), "counter").collect().head
    assert(audit.getAs[Long]("n") === 100L)
    assert(audit.getAs[Long]("lost") === 0L)
    assert(audit.getAs[Long]("duplicated") === 0L)
  }

  test("generator is deterministic and stream twin matches batch schema") {
    val a = SensorGenerator.batch(spark, 50).collect()
    val b = SensorGenerator.batch(spark, 50).collect()
    assert(a.sameElements(b))
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(SensorGenerator.stream(spark).schema) ===
      shape(SensorGenerator.batch(spark, 1).schema))
    // CSV round trip: body parses back to the same typed row
    val parsed = graft.sources.Envelope.parseBody(
      SensorGenerator.toCsvBody(SensorGenerator.batch(spark, 20)))
    assert(parsed.count() === 20)
    assert(parsed.filter("counter IS NULL").count() === 0)
  }

  test("Kafka-shaped envelope mints the reference's commit token") {
    import org.apache.spark.sql.functions._
    // the built-in Kafka source schema, synthesized from the generator
    val kafkaShaped = SensorGenerator.toCsvBody(
        SensorGenerator.batch(spark, 10))
      .select(
        col("key").cast("string").as("key"),
        col("body").as("value"),
        lit("my_sensors_data").as("topic"),
        (col("key") % 2).cast("int").as("partition"),
        col("key").as("offset"),
        current_timestamp().as("timestamp"))
    val tokens = graft.sources.Envelope.withCommitToken(kafkaShaped)
      .select("commit_token", "partition", "offset").collect()
    tokens.foreach { r =>
      // e.g. "my_sensors_data/0/3" (reference images/wiretapAtMostOnce.png)
      assert(r.getString(0) ===
        s"my_sensors_data/${r.getInt(1)}/${r.getLong(2)}")
    }
    // and the value parses back against the declared sensor schema
    val parsed = graft.sources.Envelope.parseBody(
      kafkaShaped.withColumnRenamed("value", "body"))
    assert(parsed.filter("counter IS NULL").count() === 0)
  }
}
