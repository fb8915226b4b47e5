package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.TextOps

/** Frozen-vocabulary BPE encode on a LIVE document stream — the
  * serving-time tokenizer stage of an ingest pipeline: documents
  * arrive, each is encoded against the stored merge table, and the
  * per-doc token-count report flows to the sink.
  *
  * The merge table is a tiny model artifact (vocab-size rows — the
  * quantizer-seed stance) collected ONCE at stream wiring time and
  * shipped in the task closure; the per-row encode is the same greedy
  * in-doc replay the batch serving path runs
  * ([[graft.operators.TextOps.bpeApplyFromStore]] mechanics, shared
  * via `bpeEncodeReport`), a pure stateless projection. So the stream
  * needs NO state store, no watermark, no shuffle — every micro-batch
  * is a narrow map, a crash-replayed batch re-emits identical rows
  * (deterministic function of the input row + frozen artifact), and
  * throughput scales with source parallelism at any corpus size.
  *
  * Output columns match `llm_bpe_apply` (doc_id, n_toks_orig,
  * n_toks_enc, compression_bp); equality with the batch path across
  * micro-batch boundaries is asserted in StreamingBpeEncodeSpec.
  */
object StreamingBpeEncode {

  /** Encode `stream` (must carry `doc_id`, `text`) against the stored
    * ranked merge table (`merge_rank`, `a`, `b` — what [[TextOps]]'
    * `bpeTrain` persists).
    */
  def encoded(stream: DataFrame, mergeTable: DataFrame): DataFrame =
    TextOps.bpeEncodeReport(stream, TextOps.rankedMerges(mergeTable))
}
