package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingSession

/** Streaming throughput probe: replay a stress-fixture event log
  * (default: the 3M-event hot-key skew tier) through the LIVE
  * watermarked `session_window` sessionizer as a multi-micro-batch
  * file-source stream, and print one JSON line with wall time, event
  * throughput, emitted sessions, micro-batch count, and the PEAK state
  * rows the session store held — the number that proves state is
  * bounded by concurrently-open sessions, not log length, even when
  * one user owns 10 % of all events.
  *
  * Replay realism: events are range-split by event time into several
  * part files with strictly increasing mtimes (the FileStreamSource
  * replay-order contract the specs document), plus a far-future
  * sentinel that pushes the final watermark so every session closes
  * and append mode emits it — end-of-log flush included in the wall
  * time, the way a real backfill would pay it.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val fixture = args.headOption.getOrElse("/root/repo/stressdata_skew")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files
      .createTempDirectory("graft_streambench").toString
    val src = s"$base/events"
    val ev = Tables.events(spark, fixture)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"))
    val nEvents = ev.count()
    ev.repartitionByRange(8, col("ts"))
      .write.mode("overwrite").parquet(src)
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
    new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1700000000000L + i * 60000L)
      }
    val schema = spark.read.parquet(src).schema
    val out = s"$base/out"
    val t0 = System.nanoTime()
    val q = StreamingSession.sessionize(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val sessions = spark.read.parquet(out)
      .filter(col("user_id") >= 0).count()
    val progresses = q.recentProgress.toSeq
    val peakState = progresses.flatMap(_.stateOperators)
      .map(_.numRowsTotal).foldLeft(0L)(math.max)
    val batches = progresses.count(_.numInputRows > 0)

    // phase 2: live Misra–Gries heavy hitters over the same hot-key
    // stream — state is k counters per shard (CONSTANT in stream
    // length), and the superset guarantee must surface the planted hot
    // user (10 % of events ≫ the 1/(k+1) threshold) in the FINAL
    // candidate union. Latest per-shard candidates are retained via
    // foreachBatch (update-mode semantics).
    import graft.streaming.StreamingHeavyHitters
    val latest = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Long]]()
    import spark.implicits._
    val t1 = System.nanoTime()
    val hh = StreamingHeavyHitters.heavyHittersStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .filter(col("user_id") >= 0)
          .select(col("user_id")).as[Long],
        k = 20, shards = 8)
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$base/ckpt_hh")
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[
           StreamingHeavyHitters.ShardCandidates], _: Long) =>
          b.collect().foreach(sc => latest.put(sc.shard, sc.candidates))
      }
      .start()
    hh.awaitTermination()
    val hhWall = (System.nanoTime() - t1) / 1e9
    import scala.jdk.CollectionConverters._
    val candidates = latest.values().asScala.flatten.toSet
    require(candidates.contains(0L),
      s"hot user 0 (10% of stream) missing from MG candidates: $candidates")
    val hhState = hh.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsTotal).foldLeft(0L)(math.max)

    // phase 3: streaming BPE encode — the serving-time tokenizer stage
    // as a STATELESS map against the persisted merge table
    // (streaming/StreamingBpeEncode). The docs fixture defaults to the
    // 10× corpus (50k docs); the artifact build (bpeTrain → parquet) is
    // the one-time deployment step and is timed separately from the
    // serving stream. A checksum guard (row count + token sums vs the
    // batch serving path) must pass before the bench prints.
    val docsFixture = args.lift(1).getOrElse("/root/repo/stressdata")
    val docs = Tables.documents(spark, docsFixture)
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val docsSrc = s"$base/docs"
    docs.repartition(8).write.mode("overwrite").parquet(docsSrc)
    val tb = System.nanoTime()
    val mergePath = s"$base/merges"
    graft.operators.TextOps.bpeTrain(spark, docsFixture)
      .write.mode("overwrite").parquet(mergePath)
    val buildWall = (System.nanoTime() - tb) / 1e9
    val mergeTable = spark.read.parquet(mergePath)
    val dSchema = spark.read.parquet(docsSrc).schema
    val t2 = System.nanoTime()
    val bq = graft.streaming.StreamingBpeEncode.encoded(
        spark.readStream.schema(dSchema)
          .option("maxFilesPerTrigger", 2).parquet(docsSrc),
        mergeTable)
      .writeStream.format("parquet").option("path", s"$base/bpe_out")
      .option("checkpointLocation", s"$base/ckpt_bpe")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    bq.awaitTermination()
    val bpeWall = (System.nanoTime() - t2) / 1e9
    val got = spark.read.parquet(s"$base/bpe_out")
      .agg(count(lit(1)), sum(col("n_toks_orig")), sum(col("n_toks_enc")))
      .collect()(0)
    val want = graft.operators.TextOps
      .bpeApplyFromStore(spark, docsFixture, mergeTable)
      .agg(count(lit(1)), sum(col("n_toks_orig")), sum(col("n_toks_enc")))
      .collect()(0)
    require(got == want,
      s"stream encode checksum diverged from batch serving: $got vs $want")
    val nTokens = got.getLong(1)
    val bpeBatches = bq.recentProgress.count(_.numInputRows > 0)

    println(s"""{"metric":"stream_bench","fixture":"$fixture",""" +
      s""""events":$nEvents,"wall_sec":$wall,""" +
      s""""events_per_sec":${(nEvents / wall).toLong},""" +
      s""""sessions_emitted":$sessions,"micro_batches":$batches,""" +
      s""""peak_state_rows":$peakState,""" +
      s""""heavy_hitters":{"wall_sec":$hhWall,""" +
      s""""events_per_sec":${(nEvents / hhWall).toLong},""" +
      s""""candidates":${candidates.size},"hot_user_found":true,""" +
      s""""peak_state_rows":$hhState},""" +
      s""""bpe_encode":{"docs_fixture":"$docsFixture","docs":$nDocs,""" +
      s""""tokens":$nTokens,"artifact_build_sec":$buildWall,""" +
      s""""wall_sec":$bpeWall,""" +
      s""""docs_per_sec":${(nDocs / bpeWall).toLong},""" +
      s""""tokens_per_sec":${(nTokens / bpeWall).toLong},""" +
      s""""micro_batches":$bpeBatches,"checksum_equal":true}}""")
    spark.stop()
  }
}
