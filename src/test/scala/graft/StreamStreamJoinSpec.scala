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
    // repartitionByRange on ts — several files per side (coalesce cannot
    // grow the fixture's single partition) AND a time-ordered replay:
    // part-00000 carries the earliest range, so maxFilesPerTrigger=1
    // feeds micro-batches in event-time order, the way a real log
    // (Kafka, time-partitioned files) arrives. A hash repartition here
    // would scatter each time range across every file and the watermark
    // would (correctly!) drop most rows as late — replay disorder the
    // interval join is explicitly NOT designed to absorb beyond its
    // 1-hour delay.
    events.filter(col("event_type") === "view")
      .repartitionByRange(3, col("ts"))
      .write.mode("overwrite").parquet(vsrc)
    events.filter(col("event_type") === "purchase")
      .repartitionByRange(3, col("ts"))
      .write.mode("overwrite").parquet(psrc)
    // FileStreamSource picks files by MODIFICATION time, not path — all
    // parts land within the same millisecond, so without this the
    // "earliest range first" replay order is luck. Stamp strictly
    // increasing mtimes in part order.
    Seq(vsrc, psrc).foreach { dir =>
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .zipWithIndex.foreach { case (f, i) =>
          f.setLastModified(1700000000000L + i * 60000L)
        }
    }
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

  test("streamed LEFT OUTER join == batch left join: unmatched views " +
    "flush with null purchase columns once the watermark passes") {
    val base = Files.createTempDirectory("graft_ssjoin_outer").toString
    val (vsrc, psrc) = split(base)
    val q = StreamStreamJoin.attributionJoin(stream(vsrc), stream(psrc),
      joinType = "left_outer")
      .writeStream.format("memory").queryName("ssjoin_outer")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.mkString("|")
    val got = spark.table("ssjoin_outer").collect()
    val want = StreamStreamJoin.attributionJoin(
      spark.read.parquet(vsrc), spark.read.parquet(psrc),
      joinType = "left_outer").collect()
    // the outer side must actually contribute — some views have no
    // purchase inside the interval on this fixture
    assert(got.exists(_.isNullAt(3)),
      "stream must emit at least one unmatched view")
    // streamed rows are always a subset of the batch answer …
    val wantSet = want.map(key).toSet
    got.foreach(r => assert(wantSet.contains(key(r)), key(r)))
    // … and every FINALIZED view (older than the terminal watermark —
    // max event time − watermark delay − join interval) must have been
    // delivered; views inside that tail window are legitimately still
    // buffered when the bounded replay ends (Structured Streaming's
    // documented outer-join semantics: results emit when the watermark
    // proves them final, and nothing advances it past the last batch)
    val maxTs = spark.read.parquet(vsrc).unionByName(
      spark.read.parquet(psrc))
      .agg(max(col("ts"))).collect().head.getTimestamp(0).getTime
    val cutoff = maxTs - (60 + 30 + 1) * 60 * 1000L
    val gotSet = got.map(key).toSet
    val missed = want.filter(r =>
      r.getTimestamp(2).getTime < cutoff && !gotSet.contains(key(r)))
    assert(missed.isEmpty,
      s"${missed.length} finalized rows not delivered: " +
        missed.take(3).map(key).mkString("; "))
  }

  test("join state survives a checkpoint restart: second run resumes and " +
    "the combined output equals the batch join") {
    val base = Files.createTempDirectory("graft_ssjoin_rst").toString
    val stage = Files.createTempDirectory("graft_ssjoin_stage").toString
    val (vsrcAll, psrcAll) = split(stage)
    val vsrc = s"$base/views"; val psrc = s"$base/purchases"
    def parts(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    def copy(files: Seq[java.io.File], to: String): Unit = {
      new java.io.File(to).mkdirs()
      files.foreach(f => java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(to, f.getName)))
    }
    val (v1, v2) = parts(vsrcAll).splitAt(1)
    val (p1, p2) = parts(psrcAll).splitAt(1)
    // phase 1: half of each side, run to completion (state checkpointed
    // with buffered unmatched rows)
    copy(v1.toSeq, vsrc); copy(p1.toSeq, psrc)
    // parquet sink: the memory sink refuses checkpoint recovery — the
    // durable-sink path is also the one a real pipeline restarts with
    val out = s"$base/out"
    def run(): Unit = {
      val q = StreamStreamJoin.attributionJoin(stream(vsrc), stream(psrc),
        maxGapMinutes = 1440)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val phase1 = spark.read.parquet(out).count()
    // phase 2: the rest of the log lands; a NEW query instance restarts
    // from the same checkpoint — buffered views from phase 1 must meet
    // phase-2 purchases via the restored state store
    copy(v2.toSeq, vsrc); copy(p2.toSeq, psrc)
    run()
    val got = spark.read.parquet(out)
      .orderBy("user_id", "view_id", "purchase_id").collect()
    val want = StreamStreamJoin.attributionJoin(
      spark.read.parquet(vsrc), spark.read.parquet(psrc),
      maxGapMinutes = 1440)
      .orderBy("user_id", "view_id", "purchase_id").collect()
    assert(phase1 > 0 && phase1 < want.length,
      s"phase 1 must emit a strict subset ($phase1 of ${want.length})")
    assert(got.length === want.length,
      s"restarted stream emitted ${got.length} vs batch ${want.length}")
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
    // the executed STREAMING plan must be the bounded-state symmetric
    // hash join — assert it directly from the query's own progress:
    // every stateful streaming operator reports its operatorName, and
    // the stream-stream join's is "symmetricHashJoin"
    val stateOps = q.recentProgress.flatMap(_.stateOperators)
      .map(_.operatorName).toSet
    assert(stateOps.contains("symmetricHashJoin"),
      s"streaming query planned state operators $stateOps, " +
        "expected a StreamingSymmetricHashJoin")
    // and the batch twin's physical plan must not degrade either
    val batch = StreamStreamJoin.attributionJoin(
      spark.read.parquet(vsrc), spark.read.parquet(psrc))
    val plan = batch.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
