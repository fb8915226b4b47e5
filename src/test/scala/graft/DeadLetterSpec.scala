package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.streaming.DeadLetter

/** Streaming dead-letter routing: malformed message bodies park in the
  * DLQ sink with their disposition while good ones continue, fully
  * typed, to the main sink — one source scan per micro-batch, and the
  * split survives a second batch arriving after the first completes.
  */
class DeadLetterSpec extends SparkSpec {
  import spark.implicits._

  test("router splits good and poison messages across two sinks") {
    val base = Files.createTempDirectory("graft_dlq").toString
    val src = s"$base/src"
    Seq(
      (1L, "1,10,click,2.5"),
      (2L, "2,11"),                    // truncated: lost fields
      (3L, "3,12,view,not_a_number"),  // type fault in reading
      (4L, "4,13,purchase,9.0"))
      .toDF("event_id", "body")
      .coalesce(1).write.mode("overwrite").parquet(src)

    val okRows = ArrayBuffer.empty[(Long, Long, String, Double)]
    val dlqRows = ArrayBuffer.empty[(String, String)]
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)
    val q = DeadLetter.route(stream, s"$base/ckpt") { ok =>
      okRows ++= ok.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getDouble(3)))
    } { dlq =>
      dlqRows ++= dlq.collect().map(r => (r.getString(0), r.getString(1)))
    }
    try {
      q.processAllAvailable()
      assert(okRows.sortBy(_._1) == ArrayBuffer(
        (1L, 10L, "click", 2.5), (4L, 13L, "purchase", 9.0)))
      assert(dlqRows.sortBy(_._1) == ArrayBuffer(
        ("2,11", "dead_letter_truncated"),
        ("3,12,view,not_a_number", "dead_letter_badtype")))

      // a later micro-batch routes independently — the poison message
      // parks, the good one flows, nothing from batch 1 re-emits
      Seq((5L, "5,14,error,0.25"), (6L, "garbage"))
        .toDF("event_id", "body")
        .coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(okRows.size == 3 && okRows.exists(_._1 == 5L))
      assert(dlqRows.size == 3 &&
        dlqRows.contains(("garbage", "dead_letter_truncated")))
    } finally q.stop()
  }
}
