package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k by score: a typed Aggregator whose buffer is a k-bounded
  * list, so Spark's partial aggregation keeps only k candidates per
  * (group × partition) map-side and the shuffle carries k rows per group —
  * not the full scored cross product the window-function form
  * (`row_number() over (...) <= k`) must repartition.
  *
  * Ordering matches the window form exactly: score DESC, id ASC tiebreak —
  * the output is byte-identical, only the plan changes.
  */
object TopKByScore {

  case class ScoredId(id: Long, score: Double)
  case class Buf(items: Seq[ScoredId])

  /** Total order: higher score first; ties broken by smaller id. */
  private def lt(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  case class TopKAgg(k: Int) extends Aggregator[ScoredId, Buf, Seq[ScoredId]] {
    def zero: Buf = Buf(Nil)
    // k is tiny (5 here): sort-and-trim on append keeps the buffer exact
    // and the code obvious; a binary heap only pays off for large k.
    def reduce(b: Buf, a: ScoredId): Buf =
      Buf((a +: b.items).sortWith(lt).take(k))
    def merge(x: Buf, y: Buf): Buf =
      Buf((x.items ++ y.items).sortWith(lt).take(k))
    def finish(r: Buf): Seq[ScoredId] = r.items.sortWith(lt)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
