package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.DedupOps
import graft.streaming.StreamingNearDedup

/** Streaming near-dedup throughput probe: build the keeper-only artifact
  * store from a stress fixture's snapshot slice (doc_id < boundary),
  * replay the remaining docs as an mtime-ordered multi-micro-batch file
  * stream through [[StreamingNearDedup]], and print one JSON line with
  * the store-build wall, the streaming wall, docs/sec, micro-batch
  * count, and the verdict census. The number that matters at 100 TB is
  * the STREAMING wall: each micro-batch pays one batch-sized LSH pass +
  * joins against the store's artifact columns — never a store text
  * rescan — so per-batch cost tracks batch size while the store grows.
  *
  * Usage: runMain graft.StreamNearDedupBench [fixtureDir] [nBatches]
  */
object StreamNearDedupBench {
  def main(args: Array[String]): Unit = {
    val fixture = args.headOption.getOrElse("/root/repo/stressdata100")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files
      .createTempDirectory("graft_snd_bench").toString
    val docs = Tables.documents(spark, fixture)
    val k = Tables.snapshotBoundary(spark, fixture, "documents")
    val storePath = s"$base/store"

    val t0 = System.nanoTime()
    DedupOps.snapshotArtifacts(spark, docs.filter(col("doc_id") < k))
      .write.parquet(storePath)
    val storeBuildSec = (System.nanoTime() - t0) / 1e9
    val storeRows = spark.read.parquet(storePath).count()

    // equal doc_id ranges (StressGen ids are dense), one part file per
    // micro-batch, strictly increasing mtimes (FileStreamSource replays
    // by mtime — the StreamStreamJoinSpec contract)
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val span = (maxId - k + nBatches) / nBatches
    val src = s"$base/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val now = System.currentTimeMillis() - 600000
    var batchDocs = 0L
    (0 until nBatches).foreach { i =>
      val lo = k + i * span
      val hi = math.min(maxId + 1, lo + span)
      val tmp = s"$base/tmp_$i"
      val slice = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .select(col("doc_id"), col("text"))
      batchDocs += slice.count()
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(src, f"part-$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      require(dst.toFile.setLastModified(now + i * 4000L))
    }

    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val kinds = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    // per-batch walls: the scale claim is that batch cost tracks BATCH
    // size while the store grows — the last batch joins a store 25%
    // bigger than the first's and must not pay 25% more. Timed INSIDE
    // the foreachBatch body around the verdict pass itself, so stream
    // startup latency and trigger gaps never inflate a wall (the r15
    // form marked lastMark before start(), padding the first batch);
    // the queue gives safe publication from the micro-batch thread to
    // the post-awaitTermination read.
    val batchWalls = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val t1 = System.nanoTime()
    val q = stream.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val bt = System.nanoTime()
        val v = StreamingNearDedup.verdictBatch(b.sparkSession, b, storePath)
        v.groupBy(col("kind")).agg(count(lit(1))).collect().foreach(r =>
          kinds.merge(r.getString(0), r.getLong(1), Long.box(_) + _))
        batchWalls.add((System.nanoTime() - bt) / 1e9)
        batches.incrementAndGet()
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamSec = (System.nanoTime() - t1) / 1e9
    val storeRowsAfter = spark.read.parquet(storePath).count()

    import scala.jdk.CollectionConverters._
    val kindsJson = kinds.asScala.toSeq.sortBy(_._1)
      .map { case (kk, v) => s""""$kk":$v""" }.mkString("{", ",", "}")
    val walls = {
      import scala.jdk.CollectionConverters._
      batchWalls.asScala.toSeq
    }
    println(s"""{"metric":"stream_near_dedup","sf":"$fixture",""" +
      s""""store_docs":$storeRows,"store_build_sec":$storeBuildSec,""" +
      s""""batch_docs":$batchDocs,"micro_batches":${batches.get()},""" +
      s""""stream_sec":$streamSec,""" +
      s""""docs_per_sec":${batchDocs / streamSec},""" +
      s""""batch_walls_sec":${walls.mkString("[", ",", "]")},""" +
      s""""verdicts":$kindsJson,""" +
      s""""store_docs_after":$storeRowsAfter}""")
    spark.stop()
  }
}
