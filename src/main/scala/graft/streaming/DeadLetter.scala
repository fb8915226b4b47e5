package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Dead-letter routing for the reference's CSV wire format: parse each
  * message body (PERMISSIVE `from_csv`) and classify it off the PARSE
  * RESULT — never off out-of-band knowledge — into ok /
  * dead_letter_truncated / dead_letter_badtype. The reference's pipeline
  * retries transient faults (Simulate Error, README.md:10) but a
  * malformed message is NOT transient: redelivery reproduces it forever,
  * so at-least-once delivery needs a place to park it. That place is the
  * DLQ sink; the ack still fires, so the main flow keeps its delivery
  * guarantee without wedging on a poison message.
  *
  * Batch and streaming share [[classified]] byte-for-byte
  * ([[graft.operators.IngestOps.dlqSplit]] is the oracle-checked batch
  * census), so the routing decision cannot drift between the backfill
  * and the live path.
  *
  * Scale notes: classification is fully narrow (parse + CASE in one
  * codegen stage); [[route]] splits each micro-batch under
  * `foreachBatch` with the batch persisted, so the source is read once
  * per trigger — the Wiretap one-scan-two-sinks discipline — and each
  * sink write is the only extra cost.
  */
object DeadLetter {

  /** The reference DDL (README.md:144-146): the HANA target's positional
    * schema that every message body must parse against.
    */
  val messageDdl = "counter BIGINT, device BIGINT, etype STRING, reading DOUBLE"

  /** Parse `body` and classify: a missing etype means the body lost
    * fields (truncated); a present etype with an unparseable reading is
    * a type fault; everything else is deliverable.
    */
  def classified(messages: DataFrame, bodyCol: String = "body"): DataFrame =
    messages
      .withColumn("m", from_csv(col(bodyCol),
        StructType.fromDDL(messageDdl), Map.empty[String, String]))
      .withColumn("disposition",
        when(col("m.etype").isNull, "dead_letter_truncated")
          .when(col("m.reading").isNull, "dead_letter_badtype")
          .otherwise("ok"))

  /** Start the streaming router: good rows (parsed, typed) to `writeOk`,
    * dead letters (raw body + disposition, for replay tooling) to
    * `writeDlq`, one source scan per micro-batch.
    */
  def route(messages: DataFrame, checkpoint: String)(
      writeOk: DataFrame => Unit)(
      writeDlq: DataFrame => Unit): StreamingQuery =
    classified(messages)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          writeOk(batch.filter(col("disposition") === "ok")
            .select(col("m.counter").as("counter"),
              col("m.device").as("device"),
              col("m.etype").as("etype"),
              col("m.reading").as("reading")))
          writeDlq(batch.filter(col("disposition") =!= "ok")
            .select(col("body"), col("disposition")))
        } finally batch.unpersist()
        ()
      }
      .start()
}
