package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful Structured Streaming surface: native session windows and
  * arbitrary per-key state (`flatMapGroupsWithState`) — the engine-grade
  * form of the reference's stateful script operator (README.md:47–63, a
  * per-stream boolean; here a per-user offset ledger).
  */
class StatefulStreamingSpec extends SparkSpec {

  private def eventsStream(base: String): (String, DataFrame) = {
    val src = s"$base/src"
    Tables.events(spark, sf0001).coalesce(2)
      .write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    (src, spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src))
  }

  test("streaming session_window == batch session_window on same data") {
    val base = Files.createTempDirectory("graft_sess").toString
    val (src, stream) = eventsStream(base)
    val agg = (df: DataFrame) => df
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = agg(stream.withWatermark("ts", "24 hours"))
      .writeStream.format("memory").queryName("sess")
      .outputMode("complete")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("sess")
      .select(col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("user_id"), col("n"))
      .orderBy("user_id", "s").collect()
    val want = agg(spark.read.parquet(src))
      .select(col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("user_id"), col("n"))
      .orderBy("user_id", "s").collect()
    assert(got.length === want.length && got.sameElements(want))
  }

  import StatefulStreamingSpec.Ledger

  test("flatMapGroupsWithState offset ledger == batch groupBy ledger") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_state").toString
    val (src, stream) = eventsStream(base)
    def update(user: Long, rows: Iterator[(Long, Long)],
        state: GroupState[Ledger]): Iterator[Ledger] = {
      val prev = state.getOption.getOrElse(Ledger(user, Long.MinValue, 0L))
      val next = rows.foldLeft(prev) { case (acc, (_, id)) =>
        Ledger(user, math.max(acc.watermark_id, id), acc.n + 1)
      }
      state.update(next)
      Iterator(next)
    }
    val typed: Dataset[(Long, Long)] = stream
      .select(col("user_id"), col("event_id")).as[(Long, Long)]
    val q = typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
      .writeStream.format("memory").queryName("ledger")
      .outputMode("update")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // latest state per user (memory sink appends one row per update)
    val got = spark.table("ledger")
      .groupBy("user_id")
      .agg(max("watermark_id").as("watermark_id"), max("n").as("n"))
      .orderBy("user_id").collect()
    val want = spark.read.parquet(src)
      .groupBy("user_id")
      .agg(max("event_id").as("watermark_id"), count(lit(1)).as("n"))
      .orderBy("user_id").collect()
    assert(got.sameElements(want))
  }
}

object StatefulStreamingSpec {
  case class Ledger(user_id: Long, watermark_id: Long, n: Long)
}
