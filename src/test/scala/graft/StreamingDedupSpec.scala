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

  // The embedding counterpart: the narrow quantizer assignment runs
  // unchanged on an unbounded stream (pure projection), the stream-static
  // cell join surfaces near-dup hits against the stored corpus, and a
  // novel vector passes silently.
  test("streaming embed dup detector flags a copied vector, not a novel one") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sembed").toString
    val stored = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") === 5L).select("embedding")
      .collect().head.getAs[scala.collection.Seq[Float]](0).toArray
    val src = s"$base/src"
    Seq(
      (9001L, stored, 0), // exact copy of stored vector 5
      (9002L, stored.map(x => -x), 0)) // anti-parallel: cosine -1 vs 5
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val (dupHits, cachedStore) = graft.operators.SimOps
      .streamEmbedDupHits(spark, stream, sf0001)
    val q = dupHits
      .writeStream.format("memory").queryName("embed_hits")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    cachedStore.unpersist()
    val hits = spark.table("embed_hits").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.exists { case (v, s2, c) => v == 9001L && s2 == 5L && c > 0.999 },
      s"the copied vector must hit its stored original, got ${hits.toSeq}")
    assert(!hits.exists(_._1 == 9002L),
      s"the anti-parallel vector must pass silently, got ${hits.toSeq}")
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

  test("streaming URL frontier dedup: canonical-key variants collapse, " +
    "crawled pages never re-enter, novel pages pass") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_surl").toString
    // prior crawl's frontier artifact: one canonical key per known page
    val storeCanon = Seq("example.org/a", "example.org/b").toDF("canon")
    val src = s"$base/src"
    Seq(
      (1L, "https://EXAMPLE.org/a/"),        // store dup (case + slash)
      (2L, "http://example.org/c?utm_source=x"), // novel page c
      (3L, "https://example.org/c"),         // in-stream dup of 2
      (4L, "https://example.org/d?b=2&a=1")) // novel page d (params kept)
      .toDF("req_id", "url").coalesce(1)
      .write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val out = s"$base/frontier"
    val q = StreamingDedup.novelUrls(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
      storeCanon)
      .writeStream.format("parquet")
      .option("path", out)
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val landed = spark.read.parquet(out)
      .select("canon").collect().map(_.getString(0)).sorted.toSeq
    assert(landed == Seq("example.org/c", "example.org/d?a=1&b=2"),
      s"got $landed")
  }
}
