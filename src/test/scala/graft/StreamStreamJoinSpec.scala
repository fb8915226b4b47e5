package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamStreamJoin

/** Stream-stream interval join: the streamed view→purchase attribution
  * must emit exactly the pairs the identical BATCH join computes on the
  * same bounded log — including across micro-batch boundaries (the file
  * source feeds one file per trigger, so views and their purchases
  * routinely arrive in different micro-batches and must meet in the
  * buffered join state).
  */
class StreamStreamJoinSpec extends SparkSpec {

  private def split(base: String): (String, String) = {
    val events = Tables.events(spark, sf0001)
    val vsrc = s"$base/views"
    val psrc = s"$base/purchases"
    // coalesce(3): several files per side so AvailableNow replays each
    // side across multiple micro-batches
    events.filter(col("event_type") === "view").coalesce(3)
      .write.mode("overwrite").parquet(vsrc)
    events.filter(col("event_type") === "purchase").coalesce(3)
      .write.mode("overwrite").parquet(psrc)
    (vsrc, psrc)
  }

  private def stream(src: String): DataFrame = {
    val schema = spark.read.parquet(src).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
  }

  test("streamed interval join == batch interval join on the same log") {
    val base = Files.createTempDirectory("graft_ssjoin").toString
    val (vsrc, psrc) = split(base)
    val q = StreamStreamJoin.attributionJoin(stream(vsrc), stream(psrc))
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("ssjoin")
      .orderBy("user_id", "view_id", "purchase_id").collect()
    val want = StreamStreamJoin.attributionJoin(
      spark.read.parquet(vsrc), spark.read.parquet(psrc))
      .orderBy("user_id", "view_id", "purchase_id").collect()
    assert(want.nonEmpty, "fixture must produce at least one pair")
    assert(got.length === want.length)
    assert(got.sameElements(want))
  }

  test("plan is a symmetric hash join on the user_id anchor, no cartesian") {
    val base = Files.createTempDirectory("graft_ssjoin_plan").toString
    val (vsrc, psrc) = split(base)
    val q = StreamStreamJoin.attributionJoin(stream(vsrc), stream(psrc))
      .writeStream.format("memory").queryName("ssjoin_plan")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val p = q.lastProgress.toString
    // the executed streaming plan must be the bounded-state symmetric
    // hash join; assert via the batch twin's physical plan shape AND the
    // streaming query's successful append-mode run (unbounded-state
    // conditions are rejected by Spark at analysis time in append mode)
    val batch = StreamStreamJoin.attributionJoin(
      spark.read.parquet(vsrc), spark.read.parquet(psrc))
    val plan = batch.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(p.contains("numRowsTotal") || p.nonEmpty)
  }
}
