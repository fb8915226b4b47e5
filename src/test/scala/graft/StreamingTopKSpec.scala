package graft

import java.nio.file.Files

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingTopK
import graft.streaming.StreamingTopK.Scored

/** The streamed per-key leaderboard must converge to the batch top-k
  * answer regardless of how the replay slices the log into
  * micro-batches — the associative-merge property the module doc
  * claims, exercised across a multi-file AvailableNow replay.
  */
class StreamingTopKSpec extends SparkSpec {

  private val K = 3

  test("streamed top-3 per user == batch top-3 after full replay") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_stopk").toString
    val src = s"$base/src"
    Tables.events(spark, sf0001)
      .select(col("user_id").as("g"), col("event_id").as("tie"),
        col("value").as("score"))
      .coalesce(4)
      .write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream: Dataset[Scored] = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src).as[Scored]
    val q = StreamingTopK.topKStream(stream, K)
      .writeStream.format("memory").queryName("stopk")
      .outputMode("update")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the memory sink holds one row per (group, batch-it-updated-in);
    // the LAST update per group is the final state
    val got = spark.table("stopk")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(monotonically_increasing_id().desc)))
      .filter(col("rn") === 1)
      .select("g", "ties", "scores")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toList, r.getSeq[Double](2).toList))
      .toMap
    // batch answer through the NATIVE operator — the two custom top-k
    // forms certify each other
    val batch = graft.plans.TopKPerGroup(
      spark.read.parquet(src), Seq("g"), "score",
      descending = true, "tie", K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (g, rows) =>
        val sorted = rows.sortBy(r => (-r._3, r._2)).toList
        g -> (sorted.map(_._2), sorted.map(_._3))
      }
    assert(got.keySet === batch.keySet)
    batch.foreach { case (g, want) =>
      assert(got(g) === want, s"group $g")
    }
  }
}
