package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.DedupOps

/** Streaming NEAR-duplicate dedup — the continuing-crawl form of
  * [[DedupOps.dedupIncrementalFromStore]]: documents arrive as a stream,
  * each micro-batch is verdicted (keep / exact / near) against the
  * persisted artifact store PLUS itself, and only keepers' artifacts
  * ([[DedupOps.snapshotArtifacts]]: digest + minhash sketch + shingle
  * set, never raw text) are appended to the store. [[StreamingDedup]]
  * is the exact-identity layer of this shape; this module adds the LSH
  * band-join + exact-Jaccard-verify layer on the same store.
  *
  * Semantics, stated precisely because they differ from the one-shot
  * batch query in one deliberate way:
  *
  *  - The store accumulates KEEPERS ONLY (the canonical corpus — what a
  *    production pipeline persists). A later doc is therefore verdicted
  *    against canonical copies, not against previously-REJECTED dups.
  *    The one-shot `llm_dedup_incremental` query instead pairs a batch
  *    doc against every earlier batch doc, rejected or not — so on a
  *    duplicate CHAIN A≈B≈C where C resembles B but not A, the batch
  *    form rejects C (partner B) while this form KEEPS C once B is
  *    rejected: with B gone, C is the chain's second canonical
  *    representative. Both are defensible fixpoints; the streaming form
  *    matches what a keeper-only store can know. On pair-shaped
  *    duplication (the planted fixture, and the common crawl case) the
  *    two emit IDENTICAL verdicts — asserted in StreamingNearDedupSpec.
  *
  *  - Crash-replay is idempotent ON THE STORE AND ON THE VERDICT VALUE:
  *    a re-delivered micro-batch finds its own keepers already
  *    persisted; the raw incremental pass digest-matches each against
  *    its OWN stored copy (dup_of == doc_id), which [[verdictBatch]]
  *    normalizes back to the `keep` verdict before emission — a
  *    replayed batch re-emits the SAME rows as the original delivery,
  *    and appends nothing (the append filter runs on the RAW keep set,
  *    so a replayed keeper is never re-appended). Emission is therefore
  *    at-least-once in count but value-idempotent in content — the
  *    reference's at-least-once ledger with the digest as the
  *    end-to-end identifier, and genuinely exactly-once where the sink
  *    upserts by doc_id ([[JdbcUpsert]]): the upserted final state of a
  *    crash-replayed run equals the crash-free run's.
  *
  * Scale shape per micro-batch: the batch side is micro-batch-sized and
  * broadcastable; the store contributes only its digest/band-key/shingle
  * columns (scanned, never shuffled when bucketed — the
  * [[DedupOps.dedupIncrementalFromStore]] join shape, asserted
  * cartesian-free in PlanAuditSpec for the batch twin). Store appends
  * are parquet part files, one per batch — compact on the snapshot
  * cadence.
  */
object StreamingNearDedup {

  /** Verdict one (micro-)batch of documents against the artifact store
    * at `storePath`, appending novel keepers' artifacts. Returns the
    * verdict frame `(doc_id, kind, dup_of, jaccard)` — materialized
    * (collect-free eager action via localCheckpoint) BEFORE the store
    * append so the verdicts a caller sinks and the artifacts appended
    * derive from the same store state.
    */
  def verdictBatch(s: SparkSession, batch: DataFrame,
      storePath: String): DataFrame = {
    val store = s.read.parquet(storePath)
    val raw = DedupOps
      .dedupIncrementalFromStore(s, store, batch)
      .localCheckpoint(true)
    val keepers = raw.filter(col("kind") === "keep")
      .select(col("doc_id"))
    DedupOps.snapshotArtifacts(s, batch)
      .join(keepers, Seq("doc_id"), "left_semi")
      .write.mode("append").parquet(storePath)
    // Replay normalization: a re-delivered keeper digest-matches its
    // OWN stored copy (raw kind='exact', dup_of=doc_id). Emitting that
    // would make an upsert-by-doc_id sink converge to "canonical doc,
    // recorded as a dup of itself" after a crash — rewrite the
    // self-match back to the keep verdict so replay emission is
    // value-idempotent. The store append above ran on the RAW keep set,
    // so a replayed keeper still appends nothing.
    //
    // EXACT matches only: a NEAR self-match (same doc_id re-ingested
    // with MUTATED content, jaccard ≥ 0.9 against its own stored copy)
    // is not a replay — it is a content revision colliding with a
    // stale store entry, and normalizing it to `keep` would silently
    // drop the jaccard signal while the store retains the old text.
    // That row keeps its raw near verdict so the caller sees the
    // collision; re-used doc_ids with changed content are otherwise
    // outside the replay contract (the checkpoint ledger replays
    // identical batches, never mutated ones).
    val selfMatch = col("kind") === "exact" && col("dup_of") === col("doc_id")
    raw.select(col("doc_id"),
      when(selfMatch, lit("keep")).otherwise(col("kind")).as("kind"),
      when(selfMatch, lit(null)).otherwise(col("dup_of")).as("dup_of"),
      when(selfMatch, lit(null)).otherwise(col("jaccard")).as("jaccard"))
  }

  /** Attach the per-batch verdict pass to a document stream
    * (`doc_id`, `text` columns). Verdicts flow to `sink` per
    * micro-batch; keepers' artifacts append to `storePath`. The caller
    * owns checkpointing via `options` on the returned writer — this is
    * the standard foreachBatch shape, so offset tracking, replay, and
    * the idempotence argument above all ride Spark's checkpoint.
    */
  def start(stream: DataFrame, storePath: String, checkpointDir: String,
      sink: DataFrame => Unit,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : StreamingQuery = {
    val w = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        sink(verdictBatch(b.sparkSession, b, storePath))
      }
    trigger.fold(w)(w.trigger).start()
  }
}
