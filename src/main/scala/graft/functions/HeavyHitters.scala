package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter candidates: a typed Aggregator whose buffer is
  * a k-bounded counter map, mergeable across partitions (Agarwal et al.'s
  * mergeable-summaries result: merging two MG summaries and trimming back
  * to k preserves the error bound). After a full pass, every key with true
  * frequency > n/(k+1) is GUARANTEED to be in the buffer — a superset of
  * the heavy hitters, never a miss.
  *
  * Why not just groupBy(key).count? At |keys| ~ billions (URLs, n-grams,
  * token pairs) the exact aggregate must shuffle one row per distinct key
  * per partition; the MG pass keeps map-side state at k counters, ships k
  * rows per partition TOTAL, and the exact recount then runs only on the
  * (broadcastable) candidate set. Candidate CONTENTS can vary with
  * arrival order — the decrement step is order-sensitive — but the
  * superset guarantee is order-free, so the recount's output is
  * deterministic. Scala Maps here are immutable-per-update, which is fine
  * at test scale; a production buffer would use a mutable open-addressing
  * table, same algorithm.
  */
object HeavyHitters {

  case class Buf(counts: Map[Long, Long])

  case class MisraGriesAgg(k: Int)
      extends Aggregator[Long, Buf, Seq[Long]] {
    def zero: Buf = Buf(Map.empty)

    def reduce(b: Buf, key: Long): Buf =
      b.counts.get(key) match {
        case Some(c) => Buf(b.counts.updated(key, c + 1))
        case None if b.counts.size < k => Buf(b.counts.updated(key, 1L))
        case None =>
          // decrement-all: the step that charges one occurrence of every
          // tracked key against the untracked arrival
          Buf(b.counts.collect { case (x, c) if c > 1 => x -> (c - 1) })
      }

    def merge(a: Buf, b: Buf): Buf = {
      val combined = b.counts.foldLeft(a.counts) { case (m, (x, c)) =>
        m.updated(x, m.getOrElse(x, 0L) + c)
      }
      if (combined.size <= k) Buf(combined)
      else {
        // subtract the (k+1)-th largest count from everyone and drop the
        // non-positive — the mergeable-summaries trim
        val d = combined.values.toSeq.sortBy(-_).apply(k)
        Buf(combined.collect { case (x, c) if c > d => x -> (c - d) })
      }
    }

    def finish(r: Buf): Seq[Long] = r.counts.keys.toSeq.sorted
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
