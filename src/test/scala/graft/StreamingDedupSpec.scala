package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingDedup

/** Streaming incremental dedup: only novel documents reach the corpus
  * sink — duplicates of the persisted store are anti-joined away, dups
  * within the stream collapse via checkpointed dropDuplicates state, and
  * a restart over already-seen input emits nothing new.
  */
class StreamingDedupSpec extends SparkSpec {

  private def writeDocs(path: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(path)
  }

  test("stream-static anti join + in-stream state pass only novel docs") {
    val base = Files.createTempDirectory("graft_sdedup").toString
    // persisted store: two docs; its digest column is the store artifact
    import spark.implicits._
    val store = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val storeDigests = store.select(graft.operators.DedupOps.digestCol
      .as("digest"))
    // incoming batch: a store dup (different id, same normalized text —
    // case and whitespace noise), two in-stream dups of each other, and
    // one genuinely novel doc
    val src = s"$base/src"
    writeDocs(src, Seq(
      (10L, "ALPHA  beta gamma"), // exact dup of store doc 1 (normalized)
      (11L, "eta theta iota"), // novel, first arrival
      (12L, "eta  THETA iota"), // in-stream dup of 11
      (13L, "kappa lambda mu"))) // novel
    val schema = spark.read.parquet(src).schema
    val out = s"$base/novel"
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      // parquet sink: append-only and checkpoint-recoverable (the memory
      // sink cannot resume), i.e. the real corpus-append shape
      val q = StreamingDedup.novelDocs(stream, storeDigests)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    def landed(): Seq[Long] = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val ids = landed()
    assert(ids.length === 2, s"exactly two novel docs, got $ids")
    assert(ids.contains(13L))
    assert(ids.intersect(Seq(11L, 12L)).length === 1,
      "exactly one of the in-stream dup pair may pass")
    assert(!ids.contains(10L), "store duplicates must never pass")

    // restart over a replayed + extended spool: previously-seen digests
    // (even under fresh ids) emit nothing — the dedup state survived the
    // checkpoint; only the genuinely new doc comes through
    writeDocs(src, Seq(
      (20L, "eta theta iota"), // dup of already-passed digest
      (21L, "alpha beta GAMMA"), // store dup again
      (22L, "nu xi omicron"))) // novel
    run()
    val after = landed()
    assert(after.length === 3, s"one new doc after restart, got $after")
    assert(after.contains(22L))
    assert(!after.contains(20L) && !after.contains(21L))
  }
}
