package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream inner join with watermarks on both sides and a time-range
  * condition — the follows-within-an-hour pairing of `join_range_theta`,
  * run as two real streams. The joined result must equal the same join on
  * the static data: state eviction by watermark must not drop any
  * in-window pair of this bounded input.
  */
class StreamStreamJoinSpec extends SparkSpec {

  test("stream-stream range join == batch range join on same data") {
    val base = Files.createTempDirectory("graft_ssj").toString
    val src = s"$base/src"
    Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type")
      .coalesce(2).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    def sides(streaming: Boolean) = {
      val df = if (streaming)
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
      else spark.read.parquet(src)
      val a = df.select(col("event_id").as("a_id"),
        col("user_id").as("a_user"), col("ts").as("a_ts"))
      val b = df.select(col("event_id").as("b_id"),
        col("user_id").as("b_user"), col("ts").as("b_ts"))
      (if (streaming) a.withWatermark("a_ts", "31 days") else a,
        if (streaming) b.withWatermark("b_ts", "31 days") else b)
    }
    def joined(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      a.join(b, col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("a_id"), col("b_id"))
    val (sa, sb) = sides(streaming = true)
    val q = joined(sa, sb).writeStream
      .format("memory").queryName("ssj")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("ssj").orderBy("a_id", "b_id").collect()
    val (ba, bb) = sides(streaming = false)
    val want = joined(ba, bb).orderBy("a_id", "b_id").collect()
    assert(got.length === want.length,
      s"stream ${got.length} pairs vs batch ${want.length}")
    assert(got.sameElements(want))
  }
}
