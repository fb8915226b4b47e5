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

  /** Total order: higher score first; ties broken by smaller id. NaN is
    * greatest and equal to itself (matching `ORDER BY score DESC` in both
    * Spark and DuckDB) — the naive `>`/`==` pair is not a strict weak
    * ordering under NaN, which would make the kept set depend on
    * partition merge order. `-0.0 == 0.0` stays a tie (unlike
    * `Double.compare`), preserving the window form's ranking exactly.
    */
  private def lt(a: ScoredId, b: ScoredId): Boolean = {
    val aNaN = a.score.isNaN
    val bNaN = b.score.isNaN
    if (aNaN || bNaN)
      (aNaN && !bNaN) || (aNaN && bNaN && a.id < b.id)
    else a.score > b.score || (a.score == b.score && a.id < b.id)
  }

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
