package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingHeavyHitters

/** The streaming Misra–Gries twin must uphold the batch operator's
  * superset guarantee AT EVERY POINT of a multi-batch replay: after the
  * stream drains, every key whose true frequency exceeds n/(k+1) must be
  * present in the union of shard candidate sets. Candidate contents
  * beyond the guarantee may differ from the batch pass (the decrement
  * step is order-sensitive) — that is the documented contract, and the
  * recount step downstream is what makes results exact.
  */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("streaming MG candidates are a superset of true heavy hitters " +
    "across micro-batches") {
    val base = Files.createTempDirectory("graft_shh").toString
    val k = 8
    val shards = 4
    // key stream: lineitem part keys with 70% of traffic collapsed onto
    // 4 hot keys (so true heavy hitters EXIST above n/(k+1)), time-sliced
    // so state must bridge micro-batches
    val skewKey = when(col("l_partkey") % 10 < 7, col("l_partkey") % 4)
      .otherwise(col("l_partkey")).cast("long")
    val ev = Tables.lineitem(spark, sf0001)
      .select(skewKey.as("key"), col("l_shipdate"))
    val cuts = Seq(
      ("1970-01-01", "1996-01-01"),
      ("1996-01-01", "1998-01-01"),
      ("1998-01-01", "2099-01-01"))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      ev.filter(col("l_shipdate") >= lit(lo).cast("timestamp") &&
          col("l_shipdate") < lit(hi).cast("timestamp"))
        .select(col("key"))
        .coalesce(1).write.mode("overwrite").parquet(s"$base/src/slice=$i")
    }
    val stream = spark.readStream
      .schema("key BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/src/slice=*")
      .as[Long]
    val q = StreamingHeavyHitters.heavyHittersStream(stream, k, shards)
      .writeStream.format("memory").queryName("shh_stream")
      .outputMode("update")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.lastProgress.batchId >= 2,
      "expected at least 3 micro-batches — the state carry must be real")
    // Update mode re-emits a shard's candidates each batch it saw rows;
    // the LIVE summary is each shard's latest emission.
    val emissions = spark.table("shh_stream").collect()
      .map(r => (r.getAs[Int]("shard"), r.getSeq[Long](r.fieldIndex("candidates"))))
      .zipWithIndex
    val latest = emissions.groupBy(_._1._1).values
      .map(_.maxBy(_._2)._1._2).toSeq
    val candidates = latest.flatten.toSet
    assert(candidates.size <= k * shards)
    val counts = Tables.lineitem(spark, sf0001)
      .select(skewKey.as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val n = counts.map(_._2).sum
    // per-shard guarantee lifts to the global stream: freq > n_shard/(k+1)
    // suffices, and n_shard <= n, so test the stronger global bound
    val mustHave = counts.filter(_._2 > n / (k + 1)).map(_._1)
    assert(mustHave.nonEmpty, "fixture skew produced no heavy hitters")
    mustHave.foreach { key =>
      assert(candidates(key), s"heavy key $key missing from candidates")
    }
  }
}
