package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.DedupOps
import graft.streaming.StreamingNearDedup

/** Streaming near-dup dedup: per-micro-batch LSH + exact-Jaccard verdicts
  * against a keeper-only artifact store. Pins (1) verdict parity with the
  * one-shot batch incremental on the shipped fixture, (2) the documented
  * keeper-only chain divergence, (3) store idempotence under replay.
  */
class StreamingNearDedupSpec extends SparkSpec {

  /** Write `rows` as ONE parquet part file at src/<name> with an explicit
    * mtime — the file source replays by MODIFICATION time, so same-milli
    * part files would replay in arbitrary order (the StreamStreamJoinSpec
    * lesson).
    */
  private def writeBatchFile(src: String, name: String, mtime: Long,
      rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_snd_part").toString
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).head
    val dst = Paths.get(src, name)
    Files.createDirectories(dst.getParent)
    Files.move(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
    assert(dst.toFile.setLastModified(mtime))
  }

  private def collectVerdicts(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, String, Option[Long], Option[Double])] =
    df.collect().map { r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSet

  test("3-micro-batch replay reproduces the one-shot incremental " +
    "verdicts on the shipped fixture") {
    val base = Files.createTempDirectory("graft_snd").toString
    val docs = Tables.documents(spark, sf0001)
    val k = Tables.snapshotBoundary(spark, sf0001, "documents")
    val storePath = s"$base/store"
    DedupOps.snapshotArtifacts(spark, docs.filter(col("doc_id") < k))
      .write.parquet(storePath)
    // split the batch id-range into three files; ordered replay via
    // maxFilesPerTrigger=1 + strictly increasing mtimes
    val batchRows = docs.filter(col("doc_id") >= k)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val chunks = batchRows.grouped(
      math.max(1, (batchRows.size + 2) / 3)).toSeq
    val src = s"$base/src"
    val t0 = System.currentTimeMillis() - 60000
    chunks.zipWithIndex.foreach { case (rows, i) =>
      writeBatchFile(src, f"part-$i%03d.parquet", t0 + i * 4000, rows)
    }
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Option[Long], Option[Double])]
    val q = StreamingNearDedup.start(stream, storePath, s"$base/ckpt",
      v => got.synchronized { got ++= collectVerdicts(v) },
      Some(Trigger.AvailableNow()))
    q.awaitTermination()
    val expected = collectVerdicts(
      DedupOps.dedupIncrementalQuery(spark, sf0001))
    assert(got.toSet === expected)
    // every keeper's artifacts landed in the store exactly once
    val storedIds = spark.read.parquet(storePath)
      .filter(col("doc_id") >= k).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSeq
    val keepers = expected.collect { case (id, "keep", _, _) => id }
    assert(storedIds.sorted === keepers.toSeq.sorted)
  }

  test("keeper-only chain semantics: a dup-of-a-dup is the chain's " +
    "second canonical doc, not a reject") {
    import spark.implicits._
    // A ≈ B (1 token apart, shingle-Jaccard ≈ 0.94 ≥ 0.9) and
    // B ≈ C (1 more token, again ≥ 0.9) but A vs C (2 tokens apart,
    // ≈ 0.885) sits BELOW the threshold.
    val baseToks = (0 until 100).map(i => s"tok$i")
    val a = baseToks.mkString(" ")
    val b = baseToks.updated(10, "changedone").mkString(" ")
    val c = baseToks.updated(10, "changedone")
      .updated(80, "changedtwo").mkString(" ")
    val base = Files.createTempDirectory("graft_snd_chain").toString
    val storePath = s"$base/store"
    // batch 1: A alone (keeper, seeds the store)
    DedupOps.snapshotArtifacts(spark, Seq((1L, a)).toDF("doc_id", "text"))
      .write.parquet(storePath)
    // batch 2: B — near-dup of stored A, rejected, NOT appended
    val v2 = collectVerdicts(StreamingNearDedup.verdictBatch(spark,
      Seq((2L, b)).toDF("doc_id", "text"), storePath))
    assert(v2.exists { case (id, kind, dupOf, _) =>
      id == 2L && kind == "near" && dupOf.contains(1L) })
    // batch 3: C — resembles only the REJECTED B; the keeper-only store
    // holds just A, so C is kept (the chain's second canonical doc)
    val v3 = collectVerdicts(StreamingNearDedup.verdictBatch(spark,
      Seq((3L, c)).toDF("doc_id", "text"), storePath))
    assert(v3 === Set((3L, "keep", None, None)))
    // the one-shot batch form on the same three docs REJECTS C (its
    // partner set includes the rejected B) — the documented divergence
    val oneShot = collectVerdicts(DedupOps.dedupIncremental(spark,
      Seq((1L, a)).toDF("doc_id", "text"),
      Seq((2L, b), (3L, c)).toDF("doc_id", "text")))
    assert(oneShot.exists { case (id, kind, dupOf, _) =>
      id == 3L && kind == "near" && dupOf.contains(2L) })
    // and the store holds exactly the two canonical docs
    assert(spark.read.parquet(storePath).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
  }

  test("crash-replay idempotence: re-verdicting a delivered batch " +
    "appends nothing and re-emits value-identical verdicts") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_snd_replay").toString
    val storePath = s"$base/store"
    DedupOps.snapshotArtifacts(spark,
      Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"))
      .write.parquet(storePath)
    val batch = Seq(
      (5L, "zeta eta theta iota kappa"),
      (6L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val first = collectVerdicts(
      StreamingNearDedup.verdictBatch(spark, batch, storePath))
    assert(first === Set(
      (5L, "keep", None, None),
      (6L, "exact", Some(1L), None)))
    val storeAfterFirst = spark.read.parquet(storePath).count()
    // replayed delivery: keeper 5 digest-matches its own stored copy;
    // verdictBatch normalizes the self-match back to `keep`, so the
    // replay emits rows VALUE-IDENTICAL to the first delivery — an
    // upsert-by-doc_id sink converges to the crash-free final state
    val replay = collectVerdicts(
      StreamingNearDedup.verdictBatch(spark, batch, storePath))
    assert(replay === first)
    assert(spark.read.parquet(storePath).count() === storeAfterFirst)
  }

  test("near self-match is NOT normalized: a re-used doc_id with " +
    "mutated content keeps its near verdict against its stored copy") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_snd_mut").toString
    val storePath = s"$base/store"
    val toks = (0 until 100).map(i => s"tok$i")
    val orig = toks.mkString(" ")
    // one token changed: shingle-Jaccard vs the stored copy ≈ 0.94 ≥ 0.9
    val mutated = toks.updated(10, "changedone").mkString(" ")
    DedupOps.snapshotArtifacts(spark,
      Seq((1L, orig)).toDF("doc_id", "text"))
      .write.parquet(storePath)
    val v = collectVerdicts(StreamingNearDedup.verdictBatch(spark,
      Seq((1L, mutated)).toDF("doc_id", "text"), storePath))
    // the replay normalization is restricted to EXACT self-matches:
    // a content revision colliding with its own stale store entry
    // surfaces as a near-dup of itself (jaccard signal intact), never
    // a silent `keep`
    assert(v.size === 1)
    val (id, kind, dupOf, jac) = v.head
    assert(id === 1L && kind === "near" && dupOf === Some(1L))
    assert(jac.exists(j => j >= 0.9 && j < 1.0))
  }
}
