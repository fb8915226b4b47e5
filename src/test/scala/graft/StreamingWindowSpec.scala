package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** True Structured Streaming twins of the stream_* batch queries: the same
  * tumbling window over a file stream with a watermark, and watermarked
  * dedup (the exactly-once guard for late replays). Results must equal the
  * batch computation on the same data — micro-batching is an execution
  * detail, not a semantics change.
  */
class StreamingWindowSpec extends SparkSpec {

  test("streaming tumbling window + watermark == batch window on same data") {
    val base = Files.createTempDirectory("graft_stream_win").toString
    val src = s"$base/src"
    Tables.events(spark, sf0001).coalesce(2)
      .write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val streamed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = streamed.writeStream
      .format("memory").queryName("win_counts")
      .outputMode("complete")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("win_counts")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type").collect()
    val want = Tables.events(spark, sf0001)
      .groupBy(window(col("ts"), "1 hour")("start").as("ws"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("ws", "event_type").collect()
    assert(got.sameElements(want))
  }

  test("late data beyond the watermark is dropped in append-mode windows") {
    val base = Files.createTempDirectory("graft_late").toString
    val src = s"$base/src"
    import spark.implicits._
    def writeBatch(rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "ts_s")
        .selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts")
        .coalesce(1).write.mode("append").parquet(src)
    def run(): Unit = {
      val schema = spark.read.parquet(src).schema
      val q = spark.readStream.schema(schema).parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("string").as("s"), col("n"))
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // run 1: on-time events establish the watermark (13:10 − 1h = 12:10)
    writeBatch(Seq((1L, "2024-01-10 12:00:00"), (2L, "2024-01-10 12:30:00"),
      (3L, "2024-01-10 13:10:00")))
    run()
    // run 2: a 3-days-late event — beyond the checkpointed watermark
    writeBatch(Seq((4L, "2024-01-07 12:05:00")))
    run()
    // run 3: a far-future event pushes the watermark past all windows so
    // append mode emits the closed ones
    writeBatch(Seq((5L, "2024-01-20 00:00:00")))
    run()
    val windows = spark.read.parquet(s"$base/out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!windows.keySet.exists(_.startsWith("2024-01-07")),
      s"late row leaked: $windows")
    assert(windows.getOrElse("2024-01-10 12:00:00", 0L) === 2L, windows)
    assert(windows.getOrElse("2024-01-10 13:00:00", 0L) === 1L, windows)
  }

  test("watermarked dropDuplicates suppresses replayed keys across batches") {
    val base = Files.createTempDirectory("graft_stream_dedup").toString
    val src = s"$base/src"
    val ev = Tables.events(spark, sf0001).select("event_id", "ts", "event_type")
    // two overlapping deliveries of the same stream (the at-least-once replay)
    ev.filter(col("event_id") < 600).coalesce(1)
      .write.mode("append").parquet(src)
    ev.filter(col("event_id") >= 400).coalesce(1)
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .withWatermark("ts", "48 hours")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val n = spark.table("deduped").count()
    val distinct = spark.table("deduped").select("event_id").distinct().count()
    assert(n === 1000L, "each of the 1000 events exactly once")
    assert(distinct === n)
  }
}
