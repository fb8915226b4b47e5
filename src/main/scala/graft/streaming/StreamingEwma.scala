package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `ts_ewma` (graft.operators.EventOps.ewma): the
  * trailing-8-sample fixed-point EWMA as per-user arbitrary state — the
  * live smoothing a monitoring pipeline applies to the reference's sensor
  * stream before thresholding, carried across micro-batches by
  * `flatMapGroupsWithState`.
  *
  * The state per user is the ring of the last ≤8 cent-quantized
  * observations (8 Longs — fixed size, no growth with stream length), and
  * the arithmetic is the batch operator's EXACT integer form (num/den
  * under power-of-two weights, 4dp integer division), so replaying a
  * bounded log through the stream reproduces the batch answer row for row
  * — asserted in StreamingEwmaSpec across multiple micro-batches.
  *
  * Ordering contract: rows are folded in (ts, event_id) order WITHIN each
  * micro-batch; across batches the source must deliver each user's events
  * in time order (true for a time-partitioned replay or a per-key-ordered
  * log like Kafka). Late out-of-order arrivals would need a watermarked
  * buffer-and-sort stage upstream — the standard caveat for
  * order-sensitive arbitrary state.
  *
  * Scale shape: state is keyed by user_id (cardinality grows with the
  * data; HDFS-backed state store shards it), each batch shuffles only its
  * own rows, and emission is append-mode (each input row yields exactly
  * one output row, no re-emission of history).
  */
object StreamingEwma {

  case class Obs(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, value: Double)
  case class Ring(user_id: Long, cents: Seq[Long])
  case class Smoothed(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, value: Double, ewma: Double)

  private def fold(uid: Long, prev: Seq[Long], rows: Seq[Obs])
      : (Seq[Long], Seq[Smoothed]) = {
    var ring = prev
    val out = rows.sortBy(r => (r.ts.getTime, r.event_id)).map { r =>
      ring = (math.round(r.value * 100) +: ring).take(8)
      val num = ring.zipWithIndex.map { case (c, k) => c * (1L << (7 - k)) }
        .sum
      val den = ring.indices.map(k => 1L << (7 - k)).sum
      Smoothed(uid, r.event_id, r.ts, r.value,
        (num * 100 / den).toDouble / 10000.0)
    }
    (ring, out)
  }

  /** The streaming query fragment: attach to any `Dataset[Obs]` stream and
    * write the result with append output mode.
    */
  def ewmaStream(events: Dataset[Obs]): Dataset[Smoothed] = {
    implicit val ringEnc = Encoders.product[Ring]
    implicit val outEnc = Encoders.product[Smoothed]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Obs], state: GroupState[Ring]) =>
          val prev = state.getOption.map(_.cents).getOrElse(Seq.empty)
          val (ring, out) = fold(uid, prev, rows.toSeq)
          state.update(Ring(uid, ring))
          out.iterator
      }
  }
}
