package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: live view→purchase attribution — each
  * purchase paired with every view by the same user in the preceding
  * `maxGapMinutes`. This is the one Structured Streaming join shape with
  * BOUNDED state: both sides carry a watermark and the join condition
  * bounds `purchase_ts` relative to `view_ts`, so the state store can
  * evict a buffered view as soon as the purchase-side watermark passes
  * `view_ts + maxGap` (and vice versa) — without the time bound, both
  * sides would buffer forever.
  *
  * This completes the streaming join matrix next to the stream-STATIC
  * anti joins in [[StreamingDedup]]: reference README.md:47–63 motivates
  * the per-message script operator; correlating two live streams is its
  * engine-grade two-input form.
  *
  * Scale shape: both streams shuffle-partition on `user_id` (the equi
  * anchor — Spark plans StreamingSymmetricHashJoin, never a cartesian);
  * per-key buffered state is bounded by the interval × per-user event
  * rate; eviction is driven by the min of the two watermarks. Append
  * output mode — each matched pair emits exactly once, when it can no
  * longer be contradicted.
  *
  * The same function applied to two BATCH frames is the equivalence
  * oracle: StreamStreamJoinSpec replays a bounded log through both and
  * asserts row-set equality.
  */
object StreamStreamJoin {

  /** Attach to two event streams (or batch frames — the logic is
    * identical, which is what the spec exploits). `views`/`purchases`
    * must carry (user_id, event_id, ts).
    *
    * `joinType`: "inner" emits matched pairs only; "left_outer"
    * additionally emits each UNMATCHED view with NULL purchase columns —
    * in streaming, only once the purchase-side watermark proves no
    * matching purchase can still arrive (the state-store eviction point),
    * which is exactly the batch LEFT JOIN answer delivered
    * incrementally.
    */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      watermark: String = "1 hour", maxGapMinutes: Int = 30,
      joinType: String = "inner"): DataFrame = {
    val v = views
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <=
          col("view_ts") + expr(s"INTERVAL $maxGapMinutes MINUTES"),
      joinType)
      .select(col("user_id"), col("view_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"))
  }
}
