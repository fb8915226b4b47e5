package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** The streaming form of incremental corpus dedup
  * (graft.operators.DedupOps.dedupIncremental): documents arrive as a
  * stream and only NOVEL ones flow on to the corpus sink.
  *
  * Two layers, both on the normalized-text digest ([[DedupOps.digestCol]]):
  *
  *  1. in-stream exact dedup — streaming `dropDuplicates` keeps one row
  *     per digest across micro-batches, with the dedup state in the
  *     checkpoint, so a crash-replayed batch cannot re-emit a doc
  *     (the reference's idempotence-by-identifier argument,
  *     README.md:133, with the digest as the end-to-end identifier);
  *  2. a stream-static LEFT ANTI join against the persisted store's
  *     digest column — docs already in the corpus never re-enter.
  *
  * Scale notes: the anti join builds/broadcasts or shuffles only the
  * store's digest column (16 bytes/doc — the persisted store artifact,
  * not the corpus); dedup state is one digest per novel doc. For
  * unbounded streams, bound the state with a watermark on an event-time
  * column before calling (`withWatermark` + dropDuplicates semantics).
  */
object StreamingDedup {

  /** Novel documents only: in-stream digest dedup + anti join against the
    * store's digests. `stream` must carry `text`; `storeDigests` a
    * `digest` column (e.g. `DedupOps.digestCol` materialized by the prior
    * snapshot run).
    */
  def novelDocs(stream: DataFrame, storeDigests: DataFrame): DataFrame =
    stream
      .withColumn("digest", DedupOps.digestCol)
      .dropDuplicates("digest")
      .join(storeDigests.select(col("digest")), Seq("digest"), "left_anti")

  /** The URL-canonicalization layer of the same shape — the crawl
    * frontier's dedup, which fires BEFORE any text is fetched:
    * [[graft.operators.CurationOps.canonicalUrl]] is stateless (pure
    * narrow string/array expressions), so it runs unchanged on the
    * stream; one canonical key survives per micro-batch run
    * (checkpointed `dropDuplicates` state), and keys the store has
    * already crawled are anti-joined away. `stream` must carry `url`;
    * `storeCanon` a `canon` column (the prior crawl's persisted
    * frontier artifact — a string per known page, not the page itself).
    */
  def novelUrls(stream: DataFrame, storeCanon: DataFrame): DataFrame =
    stream
      .withColumn("canon",
        graft.operators.CurationOps.canonicalUrl(col("url")))
      .dropDuplicates("canon")
      .join(storeCanon.select(col("canon")), Seq("canon"), "left_anti")
}
