package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.HeavyHitters.{Buf, MisraGriesAgg}

/** Streaming twin of `agg_heavy_hitters`' candidate pass: a live
  * Misra–Gries summary over an unbounded key stream, carried across
  * micro-batches by `flatMapGroupsWithState` — the monitoring shape that
  * answers "which keys are hot RIGHT NOW" without ever keeping one counter
  * per distinct key.
  *
  * Sharding: keys hash into a FIXED shard count and each shard folds its
  * substream through the SAME `MisraGriesAgg.reduce` step the batch
  * operator uses (one algorithm, two runtimes). Hash partitioning sends
  * every occurrence of a key to exactly one shard, so the per-shard
  * superset guarantee (any key with shard-frequency > n_shard/(k+1)
  * survives) implies the global one: n_shard ≤ n, so a globally heavy key
  * is a fortiori heavy in its shard. The union of shard candidates is
  * therefore a SUPERSET of the true heavy hitters at every point in the
  * stream — the property StreamingHeavyHittersSpec asserts across a
  * multi-batch replay. Exact counts for the (bounded) candidate set come
  * from the batch recount, same as the batch operator.
  *
  * Scale shape: state is k counters per shard — CONSTANT in stream length
  * and key cardinality; each micro-batch shuffles only its own rows (by
  * shard id); emission is Update-mode (each shard re-emits its current
  * candidate set only when it processed rows). Shard count is the
  * parallelism knob, exactly like shuffle partitions.
  */
object StreamingHeavyHitters {

  case class ShardCandidates(shard: Int, candidates: Seq[Long])

  /** Attach to any `Dataset[Long]` key stream; write with Update mode. */
  def heavyHittersStream(keys: Dataset[Long], k: Int, shards: Int)
      : Dataset[ShardCandidates] = {
    val mg = MisraGriesAgg(k)
    implicit val bufEnc = Encoders.product[Buf]
    implicit val outEnc = Encoders.product[ShardCandidates]
    keys.groupByKey(key => math.floorMod(key, shards.toLong).toInt)(
      Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[Long], state: GroupState[Buf]) =>
          val buf = rows.foldLeft(state.getOption.getOrElse(mg.zero))(
            mg.reduce)
          state.update(buf)
          Iterator.single(ShardCandidates(shard, mg.finish(buf)))
      }
  }
}
