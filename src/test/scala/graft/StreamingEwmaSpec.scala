package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingEwma

/** The streaming EWMA twin must reproduce the batch `ts_ewma` answer row
  * for row when the log replays in time order — including across
  * micro-batch boundaries, where the ring state carries the smoothing
  * window from one batch into the next.
  */
class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ewma == batch ts_ewma across micro-batches") {
    val base = Files.createTempDirectory("graft_ewma").toString
    val src = s"$base/src"
    // time-sliced files: each trigger ingests one slice, so per-user
    // order holds ACROSS batches and the ring state must bridge them
    // (a single-batch run would never exercise the state carry)
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val cuts = Seq(
      ("1970-01-01", "2024-01-08"),
      ("2024-01-08", "2024-01-16"),
      ("2024-01-16", "2099-01-01"))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      ev.filter(col("ts") >= lit(lo).cast("timestamp") &&
          col("ts") < lit(hi).cast("timestamp"))
        .coalesce(1).write.mode("overwrite").parquet(s"$src/slice=$i")
    }
    val schema = ev.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/slice=*")
      .as[StreamingEwma.Obs]
    val q = StreamingEwma.ewmaStream(stream)
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.lastProgress.batchId >= 2,
      "expected at least 3 micro-batches — the state carry must be real")
    val got = spark.table("ewma_stream")
      .select(col("user_id"), col("event_id"), col("ewma"))
      .orderBy("user_id", "event_id").collect()
    val want = graft.operators.EventOps.ewma(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ewma"))
      .orderBy("user_id", "event_id").collect()
    assert(got.length == want.length && got.sameElements(want))
  }
}
