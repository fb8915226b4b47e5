package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the native batch top-k-per-group operator
  * ([[graft.plans.TopKPerGroup]]): a live "current top k per key"
  * maintained across micro-batches by `flatMapGroupsWithState` — the
  * leaderboard / best-offers / worst-latencies view a monitoring
  * pipeline keeps over the reference's sensor stream.
  *
  * State per key is the SAME bounded structure as the batch operator's
  * heap — the k best (score, tie) pairs, kept sorted best-first — so
  * state size is k entries per key regardless of stream length, and the
  * merge of a new micro-batch is associative exactly like the batch
  * partial pass (best-k of a union = best-k of union of best-ks), which
  * is what makes replay order irrelevant to the final answer.
  * Update-mode emission: each group emits its refreshed top-k only in
  * batches where it received rows.
  *
  * Determinism: the keep-order is (score desc, tie asc) with a unique
  * tie — the batch operator's total-order contract — so the streamed
  * final state equals the batch answer row for row
  * (StreamingTopKSpec asserts it across a multi-file replay).
  */
object StreamingTopK {

  case class Scored(g: Long, tie: Long, score: Double)
  case class TopK(g: Long, ties: Seq[Long], scores: Seq[Double])

  /** The one state transition: best-k of (previous best-k ∪ batch),
    * ordered (score desc, tie asc). Pure and ASSOCIATIVE — merge(merge
    * (a,b),c) ≡ best-k(a∪b∪c) for any slicing, which is the whole
    * replay-order-independence argument; StreamingTopKProps checks it
    * on random streams and random slicings.
    */
  private[graft] def merge(prev: Seq[(Double, Long)],
      batch: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    // explicit comparator, NOT sortBy(-s, t): negating a NaN score
    // yields NaN which sorts LAST ascending, while the batch operator's
    // interpreted Double ordering ranks NaN as the LARGEST score.
    // java.lang.Double.compare(b, a) gives the same NaN-greatest
    // descending order, keeping the streamed==batch row-for-row contract
    // even with NaN scores.
    (prev ++ batch).sorted(Ordering.fromLessThan[(Double, Long)] {
      case ((sa, ta), (sb, tb)) =>
        val c = java.lang.Double.compare(sb, sa)
        if (c != 0) c < 0 else ta < tb
    }).take(k)

  def topKStream(rows: Dataset[Scored], k: Int): Dataset[TopK] = {
    implicit val topkEnc = Encoders.product[TopK]
    rows.groupByKey(_.g)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (g: Long, batch: Iterator[Scored], state: GroupState[TopK]) =>
          val prev = state.getOption
            .map(s => s.scores.zip(s.ties)).getOrElse(Seq.empty)
          val merged = merge(prev,
            batch.map(r => (r.score, r.tie)).toSeq, k)
          val next = TopK(g, merged.map(_._2), merged.map(_._1))
          state.update(next)
          Iterator(next)
      }
  }
}
