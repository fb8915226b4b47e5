package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingSession

/** The live `session_window` sessionizer must reproduce the batch
  * `event_sessionize` operator ROW FOR ROW on the same bounded log —
  * including sessions that span micro-batch boundaries (stitched by the
  * state store) and a crash-restart (stitched by the restored state
  * store). A far-future sentinel event pushes the watermark past every
  * real session so append mode flushes them all.
  */
class StreamingSessionSpec extends SparkSpec {

  /** Time-ordered replay files + a final watermark-flush sentinel. */
  private def prep(base: String): String = {
    val src = s"$base/events"
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"))
    ev.repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(src)
    // sentinel: one far-future event for a reserved user advances the
    // watermark past every real session-end + gap, so the no-data batch
    // after it emits every pending session
    val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    import spark.implicits._
    val tmp = s"$base/sentinel"
    Seq((-1L, -1L, "flush",
        new java.sql.Timestamp(maxTs.getTime + 86400000L)))
      .toDF("user_id", "event_id", "event_type", "ts")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val sentinelPart = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(sentinelPart.toPath,
      new java.io.File(src, "part-zzz-sentinel.parquet").toPath)
    // FileStreamSource replays by MODIFICATION time — stamp increasing
    // mtimes in name order (range parts first, sentinel last) so the
    // event-time-ordered replay is deterministic, not luck
    new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1700000000000L + i * 60000L)
      }
    src
  }

  private def stream(src: String): DataFrame = {
    val schema = spark.read.parquet(src).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
  }

  /** (user_id, ordinal, bounds, counts) rows sorted — the ordinal is
    * re-derived from session_start order so the streamed result (which
    * cannot know a global running index mid-stream) is compared with
    * the batch session_id INCLUDED.
    */
  private def normalize(df: DataFrame): Array[String] = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("session_start"))
    df.withColumn("sid", row_number().over(w).cast("long"))
      .select(col("user_id"), col("sid"),
        unix_micros(col("session_start")).as("a"),
        unix_micros(col("session_end")).as("b"),
        col("n_events"), col("n_types"), col("duration_us"))
      .collect().map(_.toSeq.mkString("|")).sorted
  }

  private def batchWant: Array[String] =
    normalize(operators.EventOps.sessionize(spark, sf0001)
      .drop("session_id"))

  test("fixture audit: no gap equals the 30-minute threshold exactly " +
    "(where session_window merge-on-< and batch split-on-> could differ)") {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val exact = Tables.events(spark, sf0001)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .filter(unix_micros(col("ts")) - col("prev_us") === 1800000000L)
      .count()
    assert(exact === 0L)
  }

  test("streamed sessionization == batch event_sessionize row for row, " +
    "across micro-batch boundaries") {
    val base = Files.createTempDirectory("graft_ssess").toString
    val src = prep(base)
    val out = s"$base/out"
    val q = StreamingSession.sessionize(stream(src))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the state operator really is the native session-window aggregate
    val stateOps = q.recentProgress.flatMap(_.stateOperators)
      .map(_.operatorName).toSet
    assert(stateOps.exists(_.toLowerCase.contains("session")),
      s"expected a session-window state operator, got $stateOps")
    val got = normalize(
      spark.read.parquet(out).filter(col("user_id") >= 0))
    val want = batchWant
    assert(want.nonEmpty)
    assert(got.length === want.length,
      s"streamed ${got.length} sessions vs batch ${want.length}")
    assert(got.sameElements(want))
  }

  test("crash mid-stream + restart from checkpoint: restored session " +
    "state stitches boundary-spanning sessions; combined output == batch") {
    val base = Files.createTempDirectory("graft_ssess_rst").toString
    val src = prep(base)
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    def start(crashAt: Option[Long]) =
      StreamingSession.sessionize(stream(src))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          // fault fires BEFORE the write, so the failed batch leaves no
          // rows and the checkpoint replays it exactly once on restart
          if (crashAt.contains(id)) sys.error("simulated fault")
          b.write.mode("append").parquet(out)
        }
        .start()
    val q1 = start(crashAt = Some(2L))
    intercept[Exception] { q1.awaitTermination() }
    val q2 = start(crashAt = None)
    q2.awaitTermination()
    val got = normalize(
      spark.read.parquet(out).filter(col("user_id") >= 0))
    val want = batchWant
    assert(got.length === want.length,
      s"streamed ${got.length} sessions vs batch ${want.length}")
    assert(got.sameElements(want))
  }
}
