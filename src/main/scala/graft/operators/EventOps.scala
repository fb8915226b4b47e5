package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-sequence analytics over the `events` table: staged funnel
  * conversion, last-touch attribution, and time-grid gap-fill (LOCF
  * resampling). These are the event-log queries a product-analytics user
  * of the reference pipeline (README.md:9-18 motivates the sensor-event
  * stream) runs downstream of ingestion; gap-based sessionization itself
  * lives in [[StreamTwinOps.session]].
  *
  * Scale notes (100 TB):
  *  - Everything here clusters by `user_id` — a key whose cardinality
  *    grows with the data (unlike a fixed enum), so hash parallelism
  *    scales with the corpus. Per-user row counts are bounded by human
  *    activity rates, so no single partition key explodes.
  *  - The funnel is aggregate-then-join: each stage reduces events to one
  *    row per user BEFORE joining the next stage, so joins move |users|
  *    rows, never |events|. All stages key on user_id — after the first
  *    shuffle every groupBy/join reuses the same hash partitioning.
  *  - Gap-fill repartitions ONCE by user_id up front; the hourly rollup,
  *    the per-user bounds, the grid join and the LOCF window all cluster
  *    by a user_id subset, so Catalyst inserts no further exchange (plan
  *    asserted in PlanAuditSpec). The generated grid is bounded by
  *    |users| x hours-in-range, independent of event volume.
  *  - Attribution is one window pass (rows frame, running `last`), one
  *    shuffle on user_id; the carried state per row is a single
  *    (type, ts) pair, not a buffered partition.
  *  - Money/metric sums run in DECIMAL (exact, order-independent) and
  *    cast to DOUBLE at the output edge, same as AggOps.
  */
object EventOps extends OpModule {

  private val touchTypes = Seq("click", "view")

  /** Staged conversion funnel signup -> view -> purchase: per user, the
    * first signup, the first view AFTER that signup, and the first
    * purchase AFTER that view; `stage` counts how deep the user got.
    * Each stage is a min-aggregate joined back on user_id, so event rows
    * never survive past their stage's aggregation.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t_signup"))
    val view = ev.filter(col("event_type") === "view")
      .join(signup, "user_id")
      .filter(col("ts") > col("t_signup"))
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(view, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    signup.join(view, Seq("user_id"), "left")
      .join(purchase, Seq("user_id"), "left")
      .select(col("user_id"), col("t_signup"), col("t_view"),
        col("t_purchase"),
        (lit(1) + when(col("t_view").isNotNull, 1).otherwise(0) +
          when(col("t_purchase").isNotNull, 1).otherwise(0)).as("stage"))
      .orderBy("user_id")
  }

  /** Last-touch attribution: for every purchase, the most recent PRECEDING
    * click/view of the same user (the touch that gets conversion credit).
    * Both attributed columns come from the same running `last` over a
    * rows-to-previous frame, so they always describe one event.
    */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    val before = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin(touchTypes.map(x => x: Any): _*)
    Tables.events(s, dir)
      .withColumn("touch_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true)
          .over(before))
      .withColumn("touch_ts",
        last(when(isTouch, col("ts")), ignoreNulls = true).over(before))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        col("ts").as("purchase_ts"), col("touch_type"), col("touch_ts"))
      .orderBy("user_id", "event_id")
  }

  /** [[attribution]] in SEGMENTED form — the hot-key-proof plan for the
    * power-law user the skew tier models (BENCH_stress_skew_r10: one
    * user holding 10 % of all events). The plain form's window
    * partitions by user_id, so that user's entire stream sorts in ONE
    * task; past ~a task-width of rows that task is the straggler no
    * executor count fixes. This form exploits that running
    * `last ignoreNulls` is PREFIX-DECOMPOSABLE:
    *
    *  1. events are bucketed into (user_id, day) segments; the running
    *     last runs per SEGMENT (the hot user's work spreads across its
    *     active days — max task = its busiest day);
    *  2. each segment's own last touch is a tiny (user, day) aggregate
    *     (`max(struct(ts, event_id, type))` — the order the window
    *     uses, as an order-free map-side-combining max);
    *  3. a prefix `last` over the per-user DAY GRID (≤ days rows per
    *     user, never event volume) carries the latest touch across
    *     segment boundaries;
    *  4. each purchase takes its within-segment hit, else the carried
    *     one. Exactness is structural — every prefix of events splits
    *     into (complete prior segments, in-segment prefix) — and
    *     spec-asserted row-for-row against the window form
    *     (EventOpsSpec), plus the shared `event_attribution` oracle.
    */
  def attributionSegmented(s: SparkSession, dir: String): DataFrame = {
    val segLenUs = 86400L * 1000000L
    val isTouch = col("event_type").isin(touchTypes.map(x => x: Any): _*)
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"))
      .withColumn("seg", unix_micros(col("ts")).divide(segLenUs)
        .cast("long"))
    val wSeg = Window.partitionBy(col("user_id"), col("seg"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = ev
      .withColumn("w_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true)
          .over(wSeg))
      .withColumn("w_ts",
        last(when(isTouch, col("ts")), ignoreNulls = true).over(wSeg))
    val segSummary = ev.filter(isTouch)
      .groupBy(col("user_id"), col("seg"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type")))
        .as("m"))
      .select(col("user_id"), col("seg"),
        col("m.ts").as("s_ts"), col("m.event_type").as("s_type"))
    val wPrefix = Window.partitionBy(col("user_id")).orderBy(col("seg"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = ev.select(col("user_id"), col("seg")).distinct()
      .join(segSummary, Seq("user_id", "seg"), "left")
      .withColumn("carry_ts", last(col("s_ts"), ignoreNulls = true)
        .over(wPrefix))
      .withColumn("carry_type", last(col("s_type"), ignoreNulls = true)
        .over(wPrefix))
      .select(col("user_id"), col("seg"), col("carry_ts"),
        col("carry_type"))
    within.join(carried, Seq("user_id", "seg"))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        col("ts").as("purchase_ts"),
        coalesce(col("w_type"), col("carry_type")).as("touch_type"),
        coalesce(col("w_ts"), col("carry_ts")).as("touch_ts"))
      .orderBy("user_id", "event_id")
  }

  /** One-task row width past which [[attributionAuto]] flips to the
    * segmented plan: ~250k rows is where a single window task's
    * sort-and-scan of one hot user's stream enters the multi-×
    * straggler decade on the skew tiers (3.2× at 3M events, 4.9× at
    * 10M — BENCH_stress_skew100x_r11 vs the uniform control).
    */
  private[graft] val hotKeyTaskRows = 250000L

  /** Estimated row count of the hottest key in `keys` (a single-column
    * frame), from a seed-pinned 1 % sample + key histogram — the cheap
    * probe [[attributionAuto]] dispatches on. One sampled scan and a
    * tiny shuffle (≤ |sampled keys| groups); at warehouse scale this
    * number comes from table statistics, and the sample keeps the probe
    * O(n/100) here. Seeded sampling makes the estimate — and therefore
    * the chosen plan — reproducible for a given fixture.
    */
  private[graft] def estimatedHotKeyRows(keys: DataFrame): Long = {
    val frac = 0.01
    val k = keys.columns.head
    val r = keys.sample(withReplacement = false, frac, seed = 42)
      .groupBy(col(k)).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0) * math.round(1 / frac)
  }

  /** [[attribution]] with SKEW-ADAPTIVE dispatch — what
    * `event_attribution` binds to since round 12. The round-10 bar said
    * "promote segmented at 5×"; the plain window form's hot-key penalty
    * hit 4.9× at the 10M-event decade and trends through the bar at the
    * next one, so the default now probes first: if the hottest user's
    * estimated stream exceeds [[hotKeyTaskRows]], the plan is
    * [[attributionSegmented]] (value-identical row-for-row — spec-
    * asserted — and ≤2× on the skew tiers); otherwise the plain
    * single-window form (cheaper on uniform keys: no segment grid or
    * carry join). Both branches share the `event_attribution` oracle,
    * so the dispatch can never change results, only the plan.
    */
  def attributionAuto(s: SparkSession, dir: String): DataFrame = {
    val hot = estimatedHotKeyRows(Tables.events(s, dir)
      .select(col("user_id")))
    val segmented = hot > hotKeyTaskRows
    // stderr breadcrumb so bench/tier logs show WHICH plan a recorded
    // number measured — the dispatch is invisible in the plan name
    System.err.println(
      s"[graft] attribution dispatch: est=$hot bar=$hotKeyTaskRows -> " +
        (if (segmented) "segmented" else "plain"))
    if (segmented) attributionSegmented(s, dir)
    else attribution(s, dir)
  }

  /** Position-based (U-shaped) multi-touch attribution: each purchase
    * credits the touches (clicks/views) since the user's previous
    * purchase — 40% to the first touch, 40% to the last, the remaining
    * 20% split over the middles; a single touch takes 100%, a pair splits
    * 50/50. Credit is EXACT integer basis points: the middle share is
    * `2000 DIV (n−2)` with the division remainder assigned to the first
    * middle touch, so every converted purchase's credits sum to exactly
    * 10000 (unit-asserted) and both engines agree bit for bit.
    *
    * Scale shape: one user_id window pass stamps each event with its
    * purchase-segment number (running count of PRIOR purchases — touches
    * after the last purchase get a segment no purchase carries and fall
    * out of the inner join); the touch↔purchase join and the per-purchase
    * rank/count windows all key on user_id supersets, so the first
    * shuffle's partitioning is reused end to end. Per-purchase touch
    * counts are bounded by human activity, so no window partition
    * explodes.
    */
  def attributionPosition(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val isTouch = col("event_type").isin(touchTypes.map(x => x: Any): _*)
    val isPurchase = col("event_type") === "purchase"
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("seg", coalesce(
        sum(when(isPurchase, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val touches = ev.filter(isTouch)
      .select(col("user_id"), col("seg"), col("event_id"),
        col("event_type"), col("ts"))
    val purchases = ev.filter(isPurchase)
      .select(col("user_id"), col("seg"), col("event_id").as("purchase_id"))
    val wp = Window.partitionBy(col("user_id"), col("purchase_id"))
      .orderBy(col("ts"), col("event_id"))
    val ranked = touches
      .join(purchases, Seq("user_id", "seg"))
      .withColumn("pos", row_number().over(wp).cast("long"))
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy(col("user_id"), col("purchase_id"))))
    ranked
      .withColumn("credit_bps",
        when(col("n") === 1, lit(10000L))
          .when(col("n") === 2, lit(5000L))
          .when(col("pos") === 1 || col("pos") === col("n"), lit(4000L))
          .when(col("pos") === 2, expr(
            "CAST(2000 AS BIGINT) DIV (n - 2) + CAST(2000 AS BIGINT) % (n - 2)"))
          .otherwise(expr("CAST(2000 AS BIGINT) DIV (n - 2)")))
      .select(col("event_type").as("channel"), col("purchase_id"),
        col("credit_bps"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("purchase_id")).as("n_conversions"),
        sum(col("credit_bps")).as("credit_bps"))
      .orderBy(col("channel"))
  }

  /** Exponential time-decay attribution — the third model in the family
    * ([[attribution]] last-touch, [[attributionPosition]] U-shaped):
    * each purchase's credit decays by half per DAY of touch age, so a
    * same-day touch earns 2× yesterday's and 4× the day before's. The
    * weights are EXACT dyadic integers — w = 2^(cap − min(Δdays, cap))
    * with cap = 30 (a >30-day-old touch flattens to weight 1; Δ is a
    * calendar-date difference, identical in both engines) — and credit
    * is integer basis points `10000·w DIV Σw` with the division
    * remainder assigned to the MOST RECENT touch, so every converted
    * purchase's credits sum to exactly 10000 (the
    * [[attributionPosition]] conservation contract, unit-asserted).
    *
    * Scale shape: identical to the position model — the same one
    * user_id window pass stamps segments, the touch↔purchase join and
    * the per-purchase sum/rank windows key on user_id supersets reusing
    * the first exchange, per-purchase touch counts are human-bounded.
    */
  def attributionDecay(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val isTouch = col("event_type").isin(touchTypes.map(x => x: Any): _*)
    val isPurchase = col("event_type") === "purchase"
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("seg", coalesce(
        sum(when(isPurchase, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val touches = ev.filter(isTouch)
      .select(col("user_id"), col("seg"), col("event_id"),
        col("event_type"), col("ts"))
    val purchases = ev.filter(isPurchase)
      .select(col("user_id"), col("seg"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    val byPurchase = Window.partitionBy(col("user_id"), col("purchase_id"))
    val ranked = touches
      .join(purchases, Seq("user_id", "seg"))
      .withColumn("delta", least(
        datediff(col("purchase_ts"), col("ts")).cast("long"), lit(30L)))
      .withColumn("weight",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - delta AS INT))"))
      .withColumn("total_w", sum(col("weight")).over(byPurchase))
      .withColumn("recency", row_number().over(byPurchase
        .orderBy(col("ts").desc, col("event_id").desc)).cast("long"))
    ranked
      .withColumn("base_bps", expr("10000 * weight DIV total_w"))
      .withColumn("sum_base", sum(col("base_bps")).over(byPurchase))
      .withColumn("credit_bps", col("base_bps") +
        when(col("recency") === 1, lit(10000L) - col("sum_base"))
          .otherwise(lit(0L)))
      .select(col("event_type").as("channel"), col("purchase_id"),
        col("credit_bps"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("purchase_id")).as("n_conversions"),
        sum(col("credit_bps")).as("credit_bps"))
      .orderBy(col("channel"))
  }

  /** Time-grid gap-fill: resample each user's first-week metric to an
    * hourly grid (first to last active hour) with
    * last-observation-carried-forward. The observation an hour keeps is
    * its LAST event's value (`max_by(value, ts)` — (user_id, ts) is
    * unique in the fixture, asserted in EventOpsSpec, so the pick is
    * deterministic on both engines).
    *
    * Shape: instead of generate-grid + left-join + LOCF-window (three
    * operators, two legs over the same rollup — which column pruning
    * splits into two scans), each observation EXPANDS FORWARD to the hour
    * before its successor (`lead` + `sequence`), so the carried value
    * rides the generate and LOCF is true by construction. One scan, one
    * explicit user_id shuffle (the rollup and the lead-window both reuse
    * it — asserted in EventOpsSpec), no join. The DuckDB twin deliberately
    * keeps the textbook grid+join+window formulation: two independent
    * routes to the same rows.
    */
  def gapfillLocf(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("ts") < lit("2024-01-08").cast("timestamp"))
      .select(col("user_id"), col("ts"), col("value"))
      .repartition(col("user_id"))
    val hourly = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(max_by(col("value"), col("ts")).as("v_obs"))
    val nxt = Window.partitionBy(col("user_id")).orderBy(col("hr"))
    hourly
      .withColumn("next_hr", lead(col("hr"), 1).over(nxt))
      .select(col("user_id"),
        explode(sequence(col("hr"),
          coalesce(col("next_hr") - expr("INTERVAL 1 HOUR"), col("hr")),
          expr("INTERVAL 1 HOUR"))).as("hr"),
        col("v_obs").as("value_locf"))
      .orderBy("user_id", "hr")
  }

  /** Linear-interpolation resample — the sibling of [[gapfillLocf]] for
    * continuous metrics (a LOCF-held sensor reading is wrong between two
    * observations a ramp apart; interpolation isn't): the same hourly
    * rollup + `lead` + `sequence` FORWARD EXPANSION (join-free, one hash
    * exchange), with the interpolated value computed in INTEGER
    * FIXED-POINT: the 2-decimal readings become exact cents, the grid
    * weights are exact microsecond spans, and the 4-decimal output is
    * one integer division — (cents·(gap−d) + next_cents·d)·100 div gap.
    * A float `v + (next−v)·frac` followed by `round(…, 4)` is NOT
    * portable here: products of 2-decimal readings with dyadic grid
    * fractions land exactly on 5-decimal rounding TIES (e.g. 23.79875),
    * where Spark's decimal-string HALF_UP and DuckDB's binary rounding
    * disagree — the fixed-point form has no round() to disagree on. The
    * trailing point of each series holds its last observation.
    */
  def resampleLinear(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("ts") < lit("2024-01-08").cast("timestamp"))
      .select(col("user_id"), col("ts"), col("value"))
      .repartition(col("user_id"))
    val hourly = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(max_by(col("value"), col("ts")).as("v_obs"))
    val nxt = Window.partitionBy(col("user_id")).orderBy(col("hr"))
    hourly
      .withColumn("next_hr", lead(col("hr"), 1).over(nxt))
      .withColumn("next_v", lead(col("v_obs"), 1).over(nxt))
      .withColumn("hr_out", explode(sequence(col("hr"),
        coalesce(col("next_hr") - expr("INTERVAL 1 HOUR"), col("hr")),
        expr("INTERVAL 1 HOUR"))))
      // weights in exact HOURS, not microseconds: the grid is hourly,
      // so the division is lossless, and the numerator's magnitude is
      // cents·gap_hours·100 (≈10¹⁰ at extreme values) instead of
      // cents·gap_µs·100, which overflows Long for readings ≥ ~1525
      // against a 7-day gap
      .withColumn("cents", round(col("v_obs") * 100, 0).cast("long"))
      .withColumn("next_cents",
        round(coalesce(col("next_v"), col("v_obs")) * 100, 0).cast("long"))
      .withColumn("d_h",
        expr("(unix_micros(hr_out) - unix_micros(hr)) div 3600000000"))
      .withColumn("gap_h",
        expr("(unix_micros(next_hr) - unix_micros(hr)) div 3600000000"))
      .withColumn("interp4", when(col("next_hr").isNotNull,
        expr("(cents * (gap_h - d_h) + next_cents * d_h) * 100 div gap_h"))
        .otherwise(col("cents") * lit(100L)))
      .select(col("user_id"), col("hr_out").as("hr"),
        (col("interp4").cast("double") / lit(10000.0)).as("value_interp"))
      .orderBy("user_id", "hr")
  }

  /** A/B experiment readout with a two-proportion z-test — the decision
    * query an experimentation platform runs over the event log: variant
    * assignment is the deterministic user_id parity (in production, the
    * bucketing hash), conversion is "any purchase", and lift/z derive
    * from FOUR exact longs through the same textbook formula on both
    * engines (the `agg_stats_moments` parity stance), with the
    * significance verdict compared on the ROUNDED z so it cannot flip on
    * a last-ulp difference.
    *
    * Scale shape: one user-keyed aggregate (map-side-combined) collapses
    * the event volume to |users| rows; the four variant counters then
    * reduce to ONE row — an aggregate tree, no window, no join anywhere.
    */
  def abLift(s: SparkSession, dir: String): DataFrame = {
    // conversion must have VARIANCE on the fixture (every user makes
    // some purchase over a month, so "any purchase" degenerates to
    // cvr = 1 in both arms and the pooled z divides by zero): the
    // fixture conversion is "a heavy buyer" (>= 14 purchases, the
    // fixture median); production plugs in its own predicate
    val per = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("np"))
      .withColumn("converted", when(col("np") >= 14L, 1L).otherwise(0L))
      .withColumn("variant", pmod(col("user_id"), lit(2L)))
    val d = (c: Column) => c.cast("double")
    per.agg(
        sum(when(col("variant") === 0L, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("variant") === 1L, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("variant") === 0L, col("converted")).otherwise(0L))
          .as("conv_control"),
        sum(when(col("variant") === 1L, col("converted")).otherwise(0L))
          .as("conv_treat"))
      .withColumn("cvr_control", d(col("conv_control")) / d(col("n_control")))
      .withColumn("cvr_treat", d(col("conv_treat")) / d(col("n_treat")))
      .withColumn("p_pool",
        d(col("conv_control") + col("conv_treat")) /
          d(col("n_control") + col("n_treat")))
      // degenerate pool (cvr 0 or 1 in BOTH arms) has no variance to
      // test against — z is NULL, not a division error
      .withColumn("z", when(col("p_pool") > 0.0 && col("p_pool") < 1.0,
        round((col("cvr_treat") - col("cvr_control")) /
          sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
            (lit(1.0) / d(col("n_control")) + lit(1.0) / d(col("n_treat")))),
          4)))
      // cvr/lift are exact rationals — presented in fixed-point 4dp
      // (integer div, no decimal-rounding tie); z's sqrt denominator is
      // irrational, so its round(…, 4) has no tie class to hit
      .withColumn("cvr_c4", expr("conv_control * 10000 div n_control"))
      .withColumn("cvr_t4", expr("conv_treat * 10000 div n_treat"))
      .select(col("n_control"), col("n_treat"),
        col("conv_control"), col("conv_treat"),
        (col("cvr_c4").cast("double") / lit(10000.0)).as("cvr_control"),
        (col("cvr_t4").cast("double") / lit(10000.0)).as("cvr_treat"),
        ((col("cvr_t4") - col("cvr_c4")).cast("double") / lit(10000.0))
          .as("lift"),
        col("z"),
        coalesce(abs(col("z")) > 1.96, lit(false)).as("significant"))
  }

  /** Cohort retention: users grouped by the week of their first signup,
    * tracked by which later weeks they were active in. Output is the
    * classic retention triangle (cohort_week × week_offset →
    * n_active / retention_pct). Week bucketing is `date_trunc('week')`
    * (Monday-based on both engines); the pct divides two small exact
    * counts, so it is bit-identical cross-engine.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val activity = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("a_week"))
      .distinct()
    // pinned: both the cohort-size aggregate and the triangle aggregate
    // read this frame — unpinned, each re-ran the two event scans and
    // the cohort/activity joins
    val joined = cohorts.join(activity, "user_id")
      .filter(col("a_week") >= col("cohort_week"))
      .withColumn("week_offset",
        (datediff(col("a_week"), col("cohort_week")) / 7).cast("int"))
      .transform(graft.Checkpoints.truncate)
    val sized = joined.groupBy(col("cohort_week"))
      .agg(countDistinct(col("user_id")).as("cohort_size"))
    joined.groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(sized, "cohort_week")
      .withColumn("retention_pct",
        col("n_active").cast("double") / col("cohort_size").cast("double"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"), col("retention_pct"))
      .orderBy("cohort_week", "week_offset")
  }

  /** OHLC bars: per user per day, the classic open/high/low/close rollup
    * — one hash aggregate, open/close picked by `min_by`/`max_by` on the
    * tie-free (user_id, ts) key.
    */
  def ohlcBars(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).as("n_ticks"))
      .orderBy("user_id", "day")

  /** Path analysis: the frequency census of 3-step event-type sequences
    * (per-user, time-ordered, overlapping). One window pass builds the
    * trigrams (two `lead`s share one sort), one aggregate counts them —
    * group cardinality is |types|³ = 125, tiny versus input, so the
    * count shuffle is bounded. Fully ordered output (count desc + the
    * trigram itself) keeps ties deterministic.
    */
  def pathTrigrams(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("step2", lead(col("event_type"), 1).over(w))
      .withColumn("step3", lead(col("event_type"), 2).over(w))
      .filter(col("step3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(desc("n"), col("step1"), col("step2"), col("step3"))
  }

  /** SCD2 dimension build from a change log: per user, collapse runs of
    * consecutive identical states (an event repeating its predecessor's
    * type is not a change), then intervalize what remains —
    * `valid_from` = the change's timestamp, `valid_to` = the NEXT
    * change's (NULL on the open current row), `version` numbering the
    * history. The classic warehouse type-2 dimension derivation, run
    * here on the event stream the reference ingests.
    *
    * Scale shape: both window passes (the `lag` change filter and the
    * `lead`/`row_number` intervalizer) partition by `user_id` with the
    * SAME (ts, event_id) sort, so one exchange + one sort serve both —
    * the filter between them preserves ordering and partitioning, and
    * per-user history is bounded by human activity rates.
    */
  def scd2(s: SparkSession, dir: String): DataFrame =
    scd2Rows(Tables.events(s, dir))
      .orderBy(col("user_id"), col("version"))

  /** [[scd2]]'s body over an arbitrary change-log slice (shared with the
    * incremental merge, which runs it only over the pre-boundary slice).
    */
  private[graft] def scd2Rows(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("prev_state", lag(col("event_type"), 1).over(w))
      .filter(col("prev_state").isNull ||
        col("prev_state") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"), col("version"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Incremental SCD2 maintenance: merge a batch of NEW change-log events
    * (ts ≥ the snapshot boundary — cdcDiff's mid-month instant) into the
    * SCD2 dimension built from the prior snapshot, WITHOUT re-windowing
    * the historical events. The store contributes exactly two shapes: its
    * closed rows pass through untouched, and its one open row per user
    * joins the batch to (a) seed the run-collapse (a batch event repeating
    * the open state is not a change) and (b) receive its `valid_to` from
    * the user's first genuine batch change. Output is BIT-IDENTICAL to the
    * full-log [[scd2]] recompute — the query shares dim_scd2's oracle SQL
    * verbatim, so the driver certifies the merge ≡ rebuild equivalence
    * value-for-value.
    *
    * Scale shape: the historical volume enters only as the already-built
    * dimension (one row per state run, NOT per event); the window passes
    * run over the batch alone; every join/window keys on user_id, so after
    * the batch's first shuffle the partitioning is reused. At 100 TB this
    * is the difference between re-sorting years of log and touching one
    * day's delta plus |users| open rows. The FromStore twin
    * ([[scd2MergeFromStore]]) reads the store from persisted parquet —
    * round-trip equivalence is test-asserted (Wave9OpsSpec).
    */
  def scd2Merge(s: SparkSession, dir: String): DataFrame = {
    val boundary = lit("2024-01-15").cast("timestamp")
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    // pinned: the merge reads the store twice (open + closed split) —
    // unpinned, each split re-ran the historical window pass. The
    // FromStore twin reads persisted parquet and must not pay this.
    val store = scd2Rows(ev.filter(col("ts") < boundary))
      .transform(graft.Checkpoints.truncate)
    val batch = ev.filter(col("ts") >= boundary)
    scd2MergeFrom(store, batch)
  }

  /** [[scd2Merge]] with the store read from a persisted SCD2 dimension
    * table instead of rebuilt from the historical log — the production
    * shape (the dimension IS the stored artifact; raw history is never
    * rescanned).
    */
  def scd2MergeFromStore(s: SparkSession, dir: String,
      storePath: String): DataFrame = {
    val boundary = lit("2024-01-15").cast("timestamp")
    val batch = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .filter(col("ts") >= boundary)
    scd2MergeFrom(s.read.parquet(storePath), batch)
  }

  private def scd2MergeFrom(store: DataFrame, batch: DataFrame): DataFrame = {
    val open = store.filter(col("is_current"))
      .select(col("user_id"), col("state").as("open_state"),
        col("valid_from").as("open_from"),
        col("version").as("open_version"))
    val closed = store.filter(!col("is_current"))
    val wb = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // A batch row is a change iff it differs from its effective
    // predecessor: the previous batch row if one exists, else the store's
    // open state, else nothing (first event ever → always a change).
    // pinned (batch-sized): the new-row window pass and the first-change
    // aggregate both read the change set — unpinned, each re-ran the
    // batch window + open-row join
    val changes = batch
      .withColumn("prev_in_batch", lag(col("event_type"), 1).over(wb))
      .join(open, Seq("user_id"), "left")
      .withColumn("prev_eff",
        coalesce(col("prev_in_batch"), col("open_state")))
      .filter(col("prev_eff").isNull ||
        col("prev_eff") =!= col("event_type"))
      .transform(graft.Checkpoints.truncate)
    val newRows = changes
      .withColumn("valid_to", lead(col("ts"), 1).over(wb))
      .withColumn("version",
        (coalesce(col("open_version"), lit(0L)) +
          row_number().over(wb)).cast("long"))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"), col("version"),
        col("valid_to").isNull.as("is_current"))
    // The open row closes at the user's first batch change (ties in ts
    // collapse to the same valid_to value, so min(ts) is exact).
    val firstChange = changes.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_change_ts"))
    val openAdj = open.join(firstChange, Seq("user_id"), "left")
      .select(col("user_id"), col("open_state").as("state"),
        col("open_from").as("valid_from"),
        col("first_change_ts").as("valid_to"),
        col("open_version").as("version"),
        col("first_change_ts").isNull.as("is_current"))
    closed.unionByName(openAdj).unionByName(newRows)
      .orderBy(col("user_id"), col("version"))
  }

  /** Gap-based sessionization (batch form): a session is a maximal run of
    * a user's events with no inactivity gap over 30 minutes; output is
    * one row per session with its bounds, size, and duration. The
    * streaming twin (`stream_session`) uses `session_window`; this is the
    * backfill/batch shape that runs over historical logs.
    *
    * Scale shape: the `lag` gap-test and the running-sum session counter
    * share one (user_id)-partitioned, (ts, event_id)-sorted window pass,
    * and the per-session aggregate groups on a user_id superset — one
    * exchange, one sort for the whole query. Durations are integer
    * microsecond arithmetic (`unix_micros`), bit-identical cross-engine.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionizedEvents(s, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"))
      .withColumn("duration_us",
        unix_micros(col("session_end")) - unix_micros(col("session_start")))
      .orderBy("user_id", "session_id")

  /** CDC snapshot diff: the per-user current state (last event's type, by
    * (ts, event_id)) at a mid-month boundary versus at the end of the
    * log, classified insert / update / unchanged — the change-data-capture
    * comparison a warehouse runs between two ingested snapshots. The log
    * is append-only, so `delete` cannot occur here, but the full-outer
    * shape produces it naturally when a key vanishes.
    *
    * Scale shape: both state extractions are (user_id)-partitioned
    * `row_number` windows and the diff is a full-outer join on the same
    * key — after the first shuffle every operator reuses the user_id
    * partitioning, and each side carries ONE row per user into the join,
    * never the event volume.
    */
  def cdcDiff(s: SparkSession, dir: String): DataFrame = {
    val boundary = lit("2024-01-15").cast("timestamp")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    def stateOf(df: DataFrame, state: String, ts: String): DataFrame = df
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type").as(state), col("ts").as(ts))
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    val old = stateOf(ev.filter(col("ts") < boundary), "old_state", "old_ts")
    val now = stateOf(ev, "new_state", "new_ts")
    old.join(now, Seq("user_id"), "full_outer")
      .withColumn("status",
        when(col("old_state").isNull, "insert")
          .when(col("new_state").isNull, "delete")
          .when(col("old_state") =!= col("new_state") ||
            col("old_ts") =!= col("new_ts"), "update")
          .otherwise("unchanged"))
      .orderBy("user_id")
  }

  /** Deadline-bounded conversion: per signup-day cohort, how many users
    * made their first post-signup purchase WITHIN 7 days — the funnel
    * with an SLA, which plain [[funnel]] (any-time conversion) cannot
    * answer. Same aggregate-then-join shape: one row per user reaches
    * each join, the deadline test is exact µs timestamp arithmetic, and
    * the conversion rate divides two exact counts.
    */
  def funnelWindowed(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t_signup"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(signup, "user_id")
      .filter(col("ts") > col("t_signup"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    signup.join(purchase, Seq("user_id"), "left")
      .withColumn("converted_7d",
        col("t_purchase").isNotNull &&
          col("t_purchase") <= col("t_signup") + expr("INTERVAL 7 DAYS"))
      .groupBy(date_trunc("day", col("t_signup")).as("cohort_day"))
      .agg(count(lit(1)).as("n_signups"),
        sum(when(col("converted_7d"), 1L).otherwise(0L))
          .as("n_converted_7d"))
      .withColumn("cvr_7d",
        col("n_converted_7d").cast("double") /
          col("n_signups").cast("double"))
      .orderBy(col("cohort_day"))
  }

  /** Daily-volume anomaly detection: per (event_type, day) event counts
    * z-scored against the type's own across-days distribution — the
    * monitoring query that catches a collector outage (count collapse)
    * or a bot burst (count spike) in an ingest pipeline.
    *
    * Parity design (the [[AggOps]] `agg_stats_moments` trick): mean and
    * variance are derived from EXACT integer sums (n_days, Σn, Σn²) with
    * the two-pass textbook formula applied in DOUBLE at the end — the
    * same named operations in the same order on both engines — instead
    * of each engine's own streaming stddev kernel, whose accumulation
    * order is engine- and partition-dependent. z is rounded to 4dp and
    * the flag compares the ROUNDED value, so the verdict cannot flip on
    * a last-ulp difference.
    *
    * Scale shape: the (type, day) census is one map-side-combined hash
    * aggregate over the raw events; everything after runs on the tiny
    * census frame (|types| × |days| rows), with the per-type moments
    * joined back via broadcast. No window over the event stream, no
    * low-cardinality partition key anywhere near the event volume.
    */
  def anomalyZscore(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("n")).as("sum_n"),
        sum(col("n") * col("n")).as("sum_n2"))
      .withColumn("mean",
        col("sum_n").cast("double") / col("n_days").cast("double"))
      // a single-day type has no sample variance (divisor n_days−1 = 0)
      // — NULL, not an ANSI division error
      .withColumn("variance", when(col("n_days") > 1,
        (col("sum_n2").cast("double") -
          col("sum_n").cast("double") * col("sum_n").cast("double") /
            col("n_days").cast("double")) /
          (col("n_days").cast("double") - lit(1.0))))
      .select(col("event_type"), col("mean"), col("variance"))
    daily.join(broadcast(stats), "event_type")
      // zero/NULL variance carries no anomaly evidence: a perfectly
      // steady type must read unflagged, never z = x/0
      .withColumn("z", when(col("variance") > 0.0, round(
        (col("n").cast("double") - col("mean")) / sqrt(col("variance")),
        4)))
      .withColumn("flagged", coalesce(abs(col("z")) > 2.0, lit(false)))
      .select(col("event_type"), col("day"), col("n"), col("z"),
        col("flagged"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Session-level event-type co-occurrence with PMI — the association
    * signal ("users who view in a session also purchase in it") behind
    * market-basket analysis, run on the [[sessionize]] boundaries.
    * pmi(a,b) = ln(n_ab · N / (n_a · n_b)) over session incidence
    * counts, where N is the total session count.
    *
    * Scale shape: the pair stream is built WITHOUT a self-join — each
    * session's distinct type set (bounded by the type enum, ≤5 here;
    * never event volume) is collected sorted and its ordered pairs are
    * generated narrowly by an indexed `transform` over the array, so the
    * only shuffles are the session aggregate (user_id-clustered, reusing
    * the sessionize exchange) and two map-side-combined counts. The
    * per-type incidence table and the one-row session total are
    * broadcast back onto the ≤|types|² pair census. A session-keyed
    * self-join would move the session table twice and fan out on
    * long sessions; the array form is bounded and exchange-light.
    */
  def cooccurPmi(s: SparkSession, dir: String): DataFrame = {
    // pinned: the pair census, the per-type incidence counts and the
    // session total all read this frame — unpinned, each of the three
    // re-ran the sessionize windows + collect_set aggregate
    val sessTypes = sessionizedEvents(s, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("types"))
      .transform(graft.Checkpoints.truncate)
    val pairs = sessTypes.select(explode(expr(
      """flatten(transform(types, (a, i) ->
        |  transform(slice(types, i + 2, size(types)),
        |            b -> struct(a AS a, b AS b))))""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    val typeCounts = sessTypes
      .select(explode(col("types")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n_t"))
    val total = sessTypes.agg(count(lit(1)).as("n_sessions"))
    pairs
      .join(broadcast(typeCounts.select(col("t").as("a"),
        col("n_t").as("n_a"))), "a")
      .join(broadcast(typeCounts.select(col("t").as("b"),
        col("n_t").as("n_b"))), "b")
      .crossJoin(broadcast(total))
      .withColumn("pmi", round(log(
        col("n_ab").cast("double") * col("n_sessions").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))), 4))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        col("pmi"))
      .orderBy(col("a"), col("b"))
  }

  /** RFM customer segmentation — the marketing-analytics staple over the
    * purchase log: per user, Recency (days since last purchase against a
    * CONFIG reference instant — the [[graft.operators.DataQualityOps]]
    * freshness stance, no data-derived "now"), Frequency (purchase
    * count), Monetary (exact DECIMAL-free cent sum), and a segment from
    * FIXED config thresholds — never data-derived quantiles, so the
    * segmentation is comparable across runs and engines by construction
    * (the dq_histogram bucketing argument).
    *
    * Parity design: recency is exact integer µs→day division, monetary
    * sums cent-quantized Longs (order-independent), and every segment
    * predicate compares integers.
    *
    * Scale shape: one map-side-combined user-keyed aggregate over the
    * purchase subset (filter pushed to the scan), then narrow CASE
    * projections. Nothing else.
    */
  def rfm(s: SparkSession, dir: String): DataFrame = {
    val refUs = 1706659200L * 1000000L // 2024-01-31 00:00:00 UTC, config
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("frequency"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      .withColumn("recency_days",
        expr(s"($refUs - last_us) div 86400000000"))
      .withColumn("monetary", col("cents").cast("double") / lit(100.0))
      .withColumn("segment",
        when(col("recency_days") <= 3 && col("frequency") >= 14, "champion")
          .when(col("recency_days") <= 3, "recent")
          .when(col("frequency") >= 14, "loyal")
          .otherwise("dormant"))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"), col("segment"))
      .orderBy(col("user_id"))
  }

  /** First-order Markov transition matrix over in-session event
    * sequences: for every within-session step a→b (consecutive events of
    * one session in (ts, event_id) order), the transition count and the
    * conditional probability p(b|a) = n_ab / n_a — the behavioral model
    * behind next-action prediction and funnel-shape mining, estimated the
    * way [[cooccurPmi]] estimates association but over ORDERED steps.
    *
    * Parity design: p(b|a) is an exact rational, so it is presented in
    * fixed-point 4dp (`n_ab * 10000 div n_a`) — integer division has no
    * decimal-rounding tie for Spark and the oracle to disagree on.
    *
    * Scale shape: the step stream is a `lead` over the SAME
    * (user_id)-partitioned (ts, event_id)-ordered window the session
    * labeling itself uses, so Catalyst reuses one exchange and one sort
    * for both; the census is a map-side-combined count whose output is
    * ≤ |types|² rows, and the per-source totals ride a window over that
    * tiny aggregated frame (the [[TextOps]] bigram-LM convention) —
    * never over the event stream. No join touches event volume.
    */
  def markovTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = sessionizedEvents(s, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("next_sess", lead(col("session_id"), 1).over(w))
      .filter(col("next_type").isNotNull &&
        col("next_sess") === col("session_id"))
    val census = steps
      .groupBy(col("event_type").as("a"), col("next_type").as("b"))
      .agg(count(lit(1)).as("n_ab"))
    census
      .withColumn("n_a", sum(col("n_ab")).over(Window.partitionBy(col("a"))))
      .withColumn("p4", expr("n_ab * 10000 div n_a"))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"),
        (col("p4").cast("double") / lit(10000.0)).as("p"))
      .orderBy(col("a"), col("b"))
  }

  /** Bounded-window EWMA over each user's metric sequence: a trailing
    * 8-sample exponentially-weighted average with per-step decay ½ —
    * the smoothing a monitoring/trend pipeline applies before
    * thresholding. The 8-sample truncation makes the recurrence a FIXED
    * linear form (weights 2⁷…2⁰ over the last 8 observations), which is
    * what lets it run as window lags instead of a sequential scan.
    *
    * Parity design ([[resampleLinear]]'s stance): the average of
    * cent-quantized values under power-of-two integer weights is an
    * exact rational — numerator and denominator are exact Longs, and the
    * 4dp presentation is one integer division (`num * 100 div den`), so
    * no accumulation order or decimal-rounding tie can split engines.
    * Warm-up rows (fewer than 8 predecessors) renormalize over the
    * weights actually present, the standard adjusted-EWMA form.
    *
    * Scale shape: one user_id-keyed window pass; all 8 lags share the
    * single exchange + sort (asserted in EventOpsSpec), state per row is
    * 8 Longs, and the partition key's cardinality grows with the data.
    */
  def ewma(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val base = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
    val withLags = (1 to 7).foldLeft(base) { (df, k) =>
      df.withColumn(s"c$k", lag(col("cents"), k).over(w))
    }
    val lagCol = (k: Int) => if (k == 0) col("cents") else col(s"c$k")
    val num = (0 to 7).map(k =>
      coalesce(lagCol(k) * lit(1L << (7 - k)), lit(0L))).reduce(_ + _)
    val den = (0 to 7).map(k =>
      when(lagCol(k).isNotNull, lit(1L << (7 - k))).otherwise(lit(0L)))
      .reduce(_ + _)
    withLags
      .withColumn("num", num)
      .withColumn("den", den)
      .withColumn("e4", expr("num * 100 div den"))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        (col("e4").cast("double") / lit(10000.0)).as("ewma"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** The per-event session labeling [[sessionize]] aggregates — factored
    * so [[cooccurPmi]] reads the same boundaries (30-min gap, (ts,
    * event_id) order) and cannot drift from the sessionize query.
    */
  private def sessionizedEvents(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 1800L * 1000000L
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        (col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs).cast("long"))
      .withColumn("session_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Weekly cohort LTV triangle: users cohorted by the Monday of their
    * first event; per (cohort_week, week_offset), the distinct buyers,
    * that week's purchase revenue, and the cohort's CUMULATIVE revenue —
    * the lifetime-value curve next to [[retention]]'s activity triangle.
    * All money stays exact integer cents ([[rfm]]'s recipe); the
    * cumulative window runs over the aggregated triangle (≤ weeks² rows),
    * partitioned by cohort_week on that tiny frame — never event volume.
    * Cohorting is aggregate-then-join: one row per user reaches the
    * purchase join, and both week truncations are Monday-based on both
    * engines (the [[retention]] precedent).
    */
  def ltvCohort(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("value"))
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        date_trunc("week", col("first_ts")).as("cohort_week"))
    ev.filter(col("event_type") === "purchase")
      .join(cohort, "user_id")
      .withColumn("week_offset", expr(
        "CAST(datediff(CAST(date_trunc('week', ts) AS DATE), " +
          "CAST(cohort_week AS DATE)) AS BIGINT) DIV 7"))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_buyers"),
        sum(col("cents")).as("revenue_cents"))
      .withColumn("cum_cents", sum(col("revenue_cents")).over(
        Window.partitionBy(col("cohort_week")).orderBy(col("week_offset"))))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** In-session behavioral pattern match (MATCH_RECOGNIZE-lite): each
    * session's events serialize to an ordered `>`-joined type path, and a
    * session matches when the path contains the view → purchase
    * SUBSEQUENCE (any gaps allowed) — the "did the journey happen inside
    * one sitting" question [[funnel]] (lifetime, cross-session) cannot
    * answer. The event-type enum guarantees no type is a substring of
    * another, so the regex is token-exact.
    *
    * Scale shape: rides [[sessionizedEvents]]' single user_id
    * exchange+sort; the path aggregate groups on a user_id superset (no
    * new shuffle), builds each session's path via
    * `array_sort(collect_list(struct))` — deterministic total order on
    * (ts, event_id) — and per-session state is bounded by human activity
    * rates. The regex runs once per SESSION row, not per event.
    */
  /** Sessions whose path contains a view followed (anywhere later) by
    * a purchase. The predicate is deliberately LOCATE-based, not the
    * equivalent regex `view.*purchase`: on a pathological hot-key
    * session (a bot or a skew-tier head user whose single session
    * path runs to megabytes) a NON-matching `view.*purchase` regex
    * backtracks catastrophically — for every 'view' occurrence the
    * engine consumes `.*` to the end and rescans, O(occurrences ×
    * length) ≈ minutes on a measured 6.6 MB path with no trailing
    * purchase — while two substring probes stay strictly linear. The
    * rewrite is exact: event types are '>'-joined literals with no
    * cross-token overlap, so "a purchase at or after the first view's
    * offset" is the same sentence the regex states.
    */
  def patternMatch(s: SparkSession, dir: String): DataFrame =
    sessionPaths(s, dir)
      .filter(expr("locate('view', path) > 0 AND " +
        "locate('purchase', path, locate('view', path)) > 0"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("path"))
      .orderBy(col("user_id"), col("session_id"))

  /** One row per session with its ordered `>`-joined type path — shared
    * by [[patternMatch]] and [[topPaths]]; rides [[sessionizedEvents]]'
    * single user_id exchange (the path aggregate groups on a user_id
    * superset).
    */
  private def sessionPaths(s: SparkSession, dir: String): DataFrame =
    sessionizedEvents(s, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("array_join(transform(array_sort(collect_list(struct(" +
          "ts, event_id, event_type))), x -> x.event_type), '>')")
          .as("path"))

  /** Most-common session journeys: the top-20 full session paths by
    * frequency — the "what do users actually do in a sitting" census
    * next to [[pathTrigrams]]' fixed-depth 3-step view. Per-path session
    * counts and total event volume; ties broken on the path string so
    * the cut is deterministic cross-engine.
    *
    * Scale shape: the path census aggregates the SESSION frame (already
    * one row per session), the top-20 is `TakeOrderedAndProject`
    * (bounded heap per partition), and path cardinality is bounded by
    * observed behavior, with heavy hitters absorbed map-side — the same
    * skew-friendly shape as the vocabulary census.
    */
  def topPaths(s: SparkSession, dir: String): DataFrame =
    sessionPaths(s, dir)
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)

  /** Seasonal-naive forecast audit: predict each (type, day)'s event
    * volume with the same weekday LAST week (the standard seasonal-naive
    * baseline every real forecaster must beat) and score it — actual,
    * forecast, absolute error, all EXACT integer counts. The join is on
    * the AGGREGATED daily frame keyed (type, day−7), so forecast rows
    * align positionally with no dense-grid assumption; days without a
    * prior-week observation keep a NULL forecast (no silent zero-fill).
    *
    * Scale shape: one map-side-combined daily census (the
    * [[anomalyZscore]] frame), then a self-join on that tiny ≤
    * |types|·|days| frame — fact volume never reaches the join.
    */
  def seasonalNaive(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val lagged = daily.select(col("event_type"),
      expr("day + INTERVAL 7 DAY").as("day"), col("n").as("forecast"))
    daily.join(lagged, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), col("n"), col("forecast"),
        when(col("forecast").isNotNull,
          abs(col("n") - col("forecast"))).as("abs_err"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Autocorrelation function of each event type's daily-volume series at
    * lags 1–3 — the seasonality detector feeding [[seasonalNaive]]:
    * a strong lag-7 beats lag-1 ⇒ weekly structure; ACF(1)≈0 ⇒ the
    * series is noise and forecasting it is pointless. Pearson r between
    * the series and its row-lagged self, with every moment (n, Σx, Σy,
    * Σxy, Σx², Σy²) an EXACT integer on the daily counts; the one
    * (num / (√vx·√vy)) division happens once in DOUBLE on bit-identical
    * operands, so both engines emit the identical double.
    *
    * Scale shape: one map-side-combined daily census is the only
    * fact-volume pass; the three lags ride ONE sort of that tiny ≤
    * |types|·|days| frame (a single window, three lag offsets), and the
    * moment aggregate collapses it to |types|·3 rows.
    */
  def tsAutocorr(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lagged = daily
      .withColumn("l1", lag(col("cnt"), 1).over(w))
      .withColumn("l2", lag(col("cnt"), 2).over(w))
      .withColumn("l3", lag(col("cnt"), 3).over(w))
    lagged
      .select(col("event_type"), col("cnt").as("x"),
        expr("stack(3, 1, l1, 2, l2, 3, l3) AS (lag, y)"))
      .filter(col("y").isNotNull)
      .groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        expr(
          """CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
            | (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)) *
            |  sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))"""
            .stripMargin).as("acf"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** Weekly stickiness: WAU / trailing-4-week MAU per calendar week — the
    * engagement ratio ("of everyone active this month, how many came back
    * this week"). Each (user, week) presence row CONTRIBUTES to the four
    * windows ending at week..week+3 via a 4-element sequence explode —
    * turning the sliding distinct-count into a plain groupBy so no window
    * re-scans the fact table; windows are then clipped to weeks that
    * exist in the data (an inner join against the WAU frame, so a
    * trailing presence row never fabricates an empty future week).
    * Stickiness is exact integer permille: 1000·wau DIV mau4.
    *
    * Scale shape: one (user, week) distinct pass is the only fact-volume
    * shuffle; the explode quadruples the AGGREGATED presence frame, the
    * distinct-user recount shuffles only (user, week) keys, and the final
    * WAU⋈MAU join is on the ≤|weeks| frame.
    */
  def stickiness(s: SparkSession, dir: String): DataFrame = {
    val presence = Tables.events(s, dir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).as("week")).distinct()
    val wau = presence.groupBy(col("week"))
      .agg(count(lit(1)).as("wau"))
    val mau = presence
      .select(col("user_id"), explode(expr(
        "sequence(week, week + INTERVAL 21 DAY, INTERVAL 7 DAY)"))
        .as("week"))
      .distinct()
      .groupBy(col("week"))
      .agg(count(lit(1)).as("mau4"))
    wau.join(mau, "week")
      .select(col("week"), col("wau"), col("mau4"),
        expr("1000 * wau DIV mau4").as("stickiness_milli"))
      .orderBy(col("week"))
  }

  /** Conversion latency by channel: how long after the last touch the
    * purchase landed — the speed-to-convert readout on [[attribution]]'s
    * exact frame (same one user-window pass). Latency in EXACT whole
    * seconds (µs difference DIV 10⁶); the per-channel average is the
    * exact integer mean of those seconds (sum DIV n — latencies are
    * non-negative so truncation is floor, identical in both engines).
    * Unattributed purchases (no prior touch) are excluded — they have
    * no latency, not a zero one.
    */
  def conversionLatency(s: SparkSession, dir: String): DataFrame = {
    val before = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin(touchTypes.map(x => x: Any): _*)
    Tables.events(s, dir)
      .withColumn("touch_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true)
          .over(before))
      .withColumn("touch_ts",
        last(when(isTouch, col("ts")), ignoreNulls = true).over(before))
      .filter(col("event_type") === "purchase" &&
        col("touch_type").isNotNull)
      .withColumn("latency_sec", expr(
        "(unix_micros(ts) - unix_micros(touch_ts)) DIV 1000000"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        expr("SUM(latency_sec) DIV COUNT(*)").as("avg_latency_sec"),
        min(col("latency_sec")).as("min_latency_sec"),
        max(col("latency_sec")).as("max_latency_sec"))
      .orderBy(col("touch_type"))
  }

  /** Week-over-week volume delta per event type — the KPI movement
    * readout ("errors up 18% WoW") in exact integer basis points:
    * (n − prev)·10⁴ DIV prev, NULL where no prior week exists (the
    * [[seasonalNaive]] no-silent-zero-fill stance). The prior week
    * aligns by a self-join on the AGGREGATED weekly frame keyed
    * (type, week−7d) — calendar-true under gaps, no dense-grid
    * assumption, no window needed at all.
    *
    * Scale shape: one map-side-combined weekly census is the only
    * fact-volume pass; the self-join runs on the ≤|types|·|weeks|
    * frame.
    */
  def wowDelta(s: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("week", col("ts")).as("week"))
      .agg(count(lit(1)).as("n"))
    val prior = weekly.select(col("event_type"),
      expr("week + INTERVAL 7 DAY").as("week"), col("n").as("prev_n"))
    weekly.join(prior, Seq("event_type", "week"), "left")
      .select(col("event_type"), col("week"), col("n"), col("prev_n"),
        expr("(n - prev_n) * 10000 DIV prev_n").as("wow_delta_bp"))
      .orderBy(col("event_type"), col("week"))
  }

  /** Weekly new-vs-returning split: each week's active users partitioned
    * into first-ever-seen-this-week vs returning — the growth-accounting
    * twin of [[stickiness]] (is the WAU line new acquisition or
    * retention?). A user's cohort week is min(week) over the same
    * (user, week) presence frame; the flag is one broadcast-free join
    * back on user_id and the split is a plain conditional count.
    *
    * Scale shape: the (user, week) distinct pass is the only fact-volume
    * shuffle; first-week is a map-side-combinable min over that frame;
    * the presence⋈first join keys on user_id (both sides are the
    * aggregated frame, already co-partitioned from the distinct).
    */
  def newVsReturning(s: SparkSession, dir: String): DataFrame = {
    val presence = Tables.events(s, dir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).as("week")).distinct()
    val first = presence.groupBy(col("user_id"))
      .agg(min(col("week")).as("first_week"))
    presence.join(first, "user_id")
      .groupBy(col("week"))
      .agg(count(lit(1)).as("active_users"),
        sum(when(col("week") === col("first_week"), 1L).otherwise(0L))
          .as("new_users"))
      .withColumn("returning_users",
        col("active_users") - col("new_users"))
      .orderBy(col("week"))
  }

  /** Audience overlap: for every event-type pair, the distinct-user
    * intersection and the Jaccard overlap in fixed-point basis points —
    * "how much of the click audience also purchases", the segmentation
    * primitive behind cross-sell and cannibalization questions.
    *
    * Scale shape: one (type, user) distinct pass over the events (the
    * only fact-volume shuffle), then a self-join keyed on user_id whose
    * per-user fan-out is bounded by the TYPE ENUM (≤ |types|² pairs per
    * user), collapsed by a ≤ |types|²-group aggregate; per-type audience
    * sizes ride the same distinct frame and broadcast onto the pair
    * census. Jaccard = inter·10⁴ DIV (|A|+|B|−inter) — exact integers,
    * no float division.
    */
  def userOverlap(s: SparkSession, dir: String): DataFrame = {
    // pinned: the per-type sizes and BOTH sides of the pair self-join
    // read this distinct (user, type) incidence frame — unpinned, each
    // of the three references re-ran the scan + distinct shuffle
    val ut = Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .transform(graft.Checkpoints.truncate)
    val sizes = ut.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))
    val pairs = ut.select(col("event_type").as("type_a"), col("user_id"))
      .join(ut.select(col("event_type").as("type_b"), col("user_id")),
        "user_id")
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n_users").as("n_a"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n_users").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        expr("n_both * 10000 DIV (n_a + n_b - n_both)").as("jaccard_bp"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** CUSUM changepoint scores over the daily per-type volume series —
    * "when did this event stream's level shift", the monitoring primitive
    * behind drift alarms on ingestion volume. One-sided CUSUM is a
    * recurrence (S_t = max(0, S_{t-1} + dev_t)) that looks
    * window-inexpressible, but has the classic prefix closed form
    * S_t = P_t − min(0, min_{j≤t} P_j) with P the running sum of
    * deviations — so both the high and low CUSUM ride ONE ordered window
    * frame, no iteration and no UDF. Deviations are exact integers
    * (n·T − total, i.e. scaled by the per-type day count T instead of
    * dividing by it), so Spark and DuckDB agree bit-for-bit.
    *
    * Scale shape: the only fact-volume pass is the daily groupBy; the
    * windows run on the aggregated |types|·|days| frame partitioned by
    * event_type — at 100 TB that frame is still ~years·|enum| rows, and
    * each type's series lands in one task (window partition), which is
    * the algorithm's inherent serial dimension, not a shuffle problem.
    */
  def changepointCusum(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy(col("event_type"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("dev",
        col("n") * count(lit(1)).over(wAll) - sum(col("n")).over(wAll))
      .withColumn("p", sum(col("dev")).over(wOrd))
      .withColumn("cusum_hi", col("p") - least(lit(0L), min(col("p")).over(wOrd)))
      .withColumn("cusum_lo", greatest(lit(0L), max(col("p")).over(wOrd)) - col("p"))
      .select(col("event_type"), col("day"), col("n"),
        col("cusum_hi"), col("cusum_lo"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Bot/automation detection via inter-event gap REGULARITY — humans
    * are bursty, schedulers are metronomes. Per user: consecutive-event
    * gaps in whole seconds (integer truncation of the µs difference,
    * identical in both engines), their exact second-moment numerator
    * `var_num = n·Σg² − (Σg)²` (≥ 0, the n²-scaled variance — no
    * division, no doubles), and the regularity flag
    * `4·var_num ≤ (Σg)²`, which is exactly CV² ≤ 1/4 (coefficient of
    * variation ≤ 0.5) because var/mean² = var_num/(Σg)². A training-data
    * pipeline runs this shape to drop machine-generated event/text
    * streams before they pollute the corpus. Overflow headroom: gaps are
    * bounded by the fixture's 30-day span in SECONDS (≤2.6·10⁶), so
    * n·Σg² stays far inside int64 even for thousands of events per user.
    *
    * Scale shape: one shuffle on user_id (the sessionize exchange), one
    * ordered-window lag, one per-user aggregate — fact-linear, no joins.
    */
  def botDetect(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .withColumn("gap_s",
        expr("(unix_micros(ts) - prev_us) DIV 1000000"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_s")).as("sum_gap_s"),
        sum(col("gap_s") * col("gap_s")).as("sumsq"))
      .filter(col("n_gaps") >= 2)
      .select(col("user_id"), col("n_gaps"), col("sum_gap_s"),
        (col("n_gaps") * col("sumsq") - col("sum_gap_s") * col("sum_gap_s"))
          .as("var_num"),
        (lit(4) * (col("n_gaps") * col("sumsq") -
          col("sum_gap_s") * col("sum_gap_s")) <=
          col("sum_gap_s") * col("sum_gap_s")).as("is_regular"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_autocorr" -> tsAutocorr,
    "event_stickiness" -> stickiness,
    "event_attribution_decay" -> attributionDecay,
    "event_new_vs_returning" -> newVsReturning,
    "event_wow_delta" -> wowDelta,
    "event_conversion_latency" -> conversionLatency,
    "event_bot_detect" -> botDetect,
    "ts_changepoint_cusum" -> changepointCusum,
    "event_user_overlap" -> userOverlap,
    "event_pattern_match" -> patternMatch,
    "event_top_paths" -> topPaths,
    "ts_seasonal_naive" -> seasonalNaive,
    "event_ltv_cohort" -> ltvCohort,
    "event_anomaly_zscore" -> anomalyZscore,
    "event_cooccur_pmi" -> cooccurPmi,
    "event_markov" -> markovTransitions,
    "event_rfm" -> rfm,
    "ts_ewma" -> ewma,
    "event_ab_lift" -> abLift,
    "ts_resample_linear" -> resampleLinear,
    "event_funnel_windowed" -> funnelWindowed,
    "event_sessionize" -> sessionize,
    "cdc_snapshot_diff" -> cdcDiff,
    "event_funnel" -> funnel,
    "event_attribution" -> attributionAuto,
    "event_attribution_segmented" -> attributionSegmented,
    "event_attribution_position" -> attributionPosition,
    "ts_gapfill_locf" -> gapfillLocf,
    "event_retention" -> retention,
    "ts_ohlc_bars" -> ohlcBars,
    "event_path_trigrams" -> pathTrigrams,
    "dim_scd2" -> scd2,
    "dim_scd2_merge" -> scd2Merge
  )

  /** Full-rebuild SCD2 SQL — shared by `dim_scd2` and `dim_scd2_merge`
    * (the merge's contract is bit-identity with the rebuild).
    */
  private val scd2OracleSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events),
      |c AS (
      |  SELECT *, lag(event_type) OVER w AS prev_state FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |ch AS (
      |  SELECT user_id, event_id, event_type, ts FROM c
      |  WHERE prev_state IS NULL OR prev_state <> event_type)
      |SELECT user_id, event_type AS state, ts AS valid_from,
      |       lead(ts) OVER w AS valid_to,
      |       CAST(row_number() OVER w AS BIGINT) AS version,
      |       lead(ts) OVER w IS NULL AS is_current
      |FROM ch
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  val oracle: Map[String, String] = Map(
    "event_user_overlap" ->
      """WITH ut AS (
        |  SELECT DISTINCT event_type, user_id FROM events),
        |sizes AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
        |  FROM ut GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         CAST(count(*) AS BIGINT) AS n_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |  WHERE a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.n_users AS n_a, sb.n_users AS n_b,
        |       n_both,
        |       n_both * 10000 // (sa.n_users + sb.n_users - n_both)
        |         AS jaccard_bp
        |FROM pairs
        |JOIN sizes sa ON sa.event_type = type_a
        |JOIN sizes sb ON sb.event_type = type_b
        |ORDER BY type_a, type_b""".stripMargin,
    "event_top_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |m AS (
        |  SELECT *, lag(epoch_us(ts)) OVER w AS prev_us FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CAST(sum(CASE WHEN prev_us IS NULL
        |                         OR epoch_us(ts) - prev_us > 1800000000
        |                       THEN 1 ELSE 0 END) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS session_id
        |  FROM m),
        |p AS (
        |  SELECT user_id, session_id,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM sess GROUP BY 1, 2)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
        |       CAST(sum(n_events) AS BIGINT) AS n_events
        |FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    "event_bot_detect" ->
      """WITH g AS (
        |  SELECT user_id,
        |         (epoch_us(CAST(ts AS TIMESTAMP)) -
        |          lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |            OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |           // 1000000 AS gap_s
        |  FROM events),
        |a AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |         CAST(sum(gap_s) AS BIGINT) AS sum_gap_s,
        |         CAST(sum(gap_s * gap_s) AS BIGINT) AS sumsq
        |  FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_gaps, sum_gap_s,
        |       CAST(n_gaps * sumsq - sum_gap_s * sum_gap_s AS BIGINT)
        |         AS var_num,
        |       4 * (n_gaps * sumsq - sum_gap_s * sum_gap_s)
        |         <= sum_gap_s * sum_gap_s AS is_regular
        |FROM a WHERE n_gaps >= 2
        |ORDER BY user_id""".stripMargin,
    "ts_changepoint_cusum" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
        |              AS TIMESTAMP) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT event_type, day, n,
        |         CAST(n * count(*) OVER (PARTITION BY event_type)
        |              - sum(n) OVER (PARTITION BY event_type) AS BIGINT)
        |           AS dev
        |  FROM daily),
        |p AS (
        |  SELECT event_type, day, n,
        |         CAST(sum(dev) OVER (
        |           PARTITION BY event_type ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS p
        |  FROM d)
        |SELECT event_type, day, n,
        |       CAST(p - least(0, min(p) OVER w) AS BIGINT) AS cusum_hi,
        |       CAST(greatest(0, max(p) OVER w) - p AS BIGINT) AS cusum_lo
        |FROM p
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin,
    "ts_seasonal_naive" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
        |              AS TIMESTAMP) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT d.event_type, d.day, d.n, f.n AS forecast,
        |       CASE WHEN f.n IS NOT NULL THEN abs(d.n - f.n) END AS abs_err
        |FROM daily d
        |LEFT JOIN daily f ON f.event_type = d.event_type
        |  AND f.day + INTERVAL 7 DAY = d.day
        |ORDER BY d.event_type, d.day""".stripMargin,
    "event_pattern_match" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |m AS (
        |  SELECT *, lag(epoch_us(ts)) OVER w AS prev_us FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CAST(sum(CASE WHEN prev_us IS NULL
        |                         OR epoch_us(ts) - prev_us > 1800000000
        |                       THEN 1 ELSE 0 END) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS session_id
        |  FROM m),
        |p AS (
        |  SELECT user_id, session_id,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM sess GROUP BY 1, 2)
        |SELECT user_id, session_id, n_events, path
        |FROM p WHERE regexp_matches(path, 'view.*purchase')
        |ORDER BY user_id, session_id""".stripMargin,
    "event_ltv_cohort" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events),
        |c AS (
        |  SELECT user_id,
        |         CAST(date_trunc('week', min(ts)) AS TIMESTAMP)
        |           AS cohort_week
        |  FROM e GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, c.cohort_week,
        |         CAST(date_diff('day', CAST(c.cohort_week AS DATE),
        |              CAST(date_trunc('week', e.ts) AS DATE)) AS BIGINT)
        |           // 7 AS week_offset,
        |         CAST(round(e.value * 100) AS BIGINT) AS cents
        |  FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase'),
        |a AS (
        |  SELECT cohort_week, week_offset,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_buyers,
        |         CAST(sum(cents) AS BIGINT) AS revenue_cents
        |  FROM p GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_buyers, revenue_cents,
        |       CAST(sum(revenue_cents) OVER (PARTITION BY cohort_week
        |            ORDER BY week_offset) AS BIGINT) AS cum_cents
        |FROM a ORDER BY cohort_week, week_offset""".stripMargin,
    "event_rfm" ->
      """WITH p AS (
        |  SELECT user_id,
        |         max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us,
        |         count(*) AS frequency,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (
        |  SELECT user_id,
        |         (1706659200000000 - last_us) // 86400000000
        |           AS recency_days,
        |         frequency,
        |         CAST(cents AS DOUBLE) / 100.0 AS monetary
        |  FROM p)
        |SELECT user_id, recency_days, frequency, monetary,
        |       CASE WHEN recency_days <= 3 AND frequency >= 14
        |              THEN 'champion'
        |            WHEN recency_days <= 3 THEN 'recent'
        |            WHEN frequency >= 14 THEN 'loyal'
        |            ELSE 'dormant' END AS segment
        |FROM m ORDER BY user_id""".stripMargin,
    "event_markov" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |m AS (
        |  SELECT *, lag(epoch_us(ts)) OVER w AS prev_us FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, event_id, event_type, ts,
        |         CAST(sum(CASE WHEN prev_us IS NULL
        |                         OR epoch_us(ts) - prev_us > 1800000000
        |                       THEN 1 ELSE 0 END) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS session_id
        |  FROM m),
        |st AS (
        |  SELECT session_id, event_type,
        |         lead(event_type) OVER w2 AS next_type,
        |         lead(session_id) OVER w2 AS next_sess
        |  FROM sess WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |pairs AS (
        |  SELECT event_type AS a, next_type AS b, count(*) AS n_ab
        |  FROM st WHERE next_type IS NOT NULL AND next_sess = session_id
        |  GROUP BY 1, 2),
        |tot AS (
        |  SELECT a, b, n_ab,
        |         CAST(sum(n_ab) OVER (PARTITION BY a) AS BIGINT) AS n_a
        |  FROM pairs)
        |SELECT a, b, n_ab, n_a,
        |       CAST(n_ab * 10000 // n_a AS DOUBLE) / 10000.0 AS p
        |FROM tot ORDER BY a, b""".stripMargin,
    "ts_autocorr" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP))
        |           AS day,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, cnt AS x,
        |         lag(cnt, 1) OVER w AS l1,
        |         lag(cnt, 2) OVER w AS l2,
        |         lag(cnt, 3) OVER w AS l3
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |pairs AS (
        |  SELECT event_type, 1 AS lag, x, l1 AS y FROM lagged
        |  UNION ALL
        |  SELECT event_type, 2, x, l2 FROM lagged
        |  UNION ALL
        |  SELECT event_type, 3, x, l3 FROM lagged),
        |s AS (
        |  SELECT event_type, lag,
        |         CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM pairs WHERE y IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, CAST(lag AS INT) AS lag, n_pairs,
        |       CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
        |         (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)) *
        |          sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS acf
        |FROM s ORDER BY event_type, lag""".stripMargin,
    "event_conversion_latency" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |tagged AS (
        |  SELECT *,
        |         last_value(CASE WHEN event_type IN ('click', 'view')
        |                         THEN event_type END IGNORE NULLS)
        |           OVER w AS touch_type,
        |         last_value(CASE WHEN event_type IN ('click', 'view')
        |                         THEN ts END IGNORE NULLS)
        |           OVER w AS touch_ts
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |lat AS (
        |  SELECT touch_type,
        |         date_diff('microsecond', touch_ts, ts) // 1000000
        |           AS latency_sec
        |  FROM tagged
        |  WHERE event_type = 'purchase' AND touch_type IS NOT NULL)
        |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_conversions,
        |       CAST(sum(latency_sec) // count(*) AS BIGINT)
        |         AS avg_latency_sec,
        |       CAST(min(latency_sec) AS BIGINT) AS min_latency_sec,
        |       CAST(max(latency_sec) AS BIGINT) AS max_latency_sec
        |FROM lat GROUP BY 1 ORDER BY 1""".stripMargin,
    "event_wow_delta" ->
      """WITH weekly AS (
        |  SELECT event_type,
        |         CAST(date_trunc('week', CAST(ts AS TIMESTAMP))
        |           AS TIMESTAMP) AS week,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT w.event_type, w.week, w.n, p.n AS prev_n,
        |       -- Spark's DIV truncates toward zero; DuckDB's // floors —
        |       -- split by sign so negative deltas agree exactly
        |       CASE WHEN w.n >= p.n THEN (w.n - p.n) * 10000 // p.n
        |            ELSE -((p.n - w.n) * 10000 // p.n) END
        |         AS wow_delta_bp
        |FROM weekly w
        |LEFT JOIN weekly p
        |  ON p.event_type = w.event_type
        | AND p.week + INTERVAL 7 DAY = w.week
        |ORDER BY w.event_type, w.week""".stripMargin,
    "event_new_vs_returning" ->
      """WITH presence AS (
        |  SELECT DISTINCT user_id,
        |         CAST(date_trunc('week', CAST(ts AS TIMESTAMP))
        |           AS TIMESTAMP) AS week
        |  FROM events),
        |first AS (
        |  SELECT user_id, min(week) AS first_week
        |  FROM presence GROUP BY 1)
        |SELECT p.week,
        |       CAST(count(*) AS BIGINT) AS active_users,
        |       CAST(sum(CASE WHEN p.week = f.first_week
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
        |       CAST(count(*) - sum(CASE WHEN p.week = f.first_week
        |                     THEN 1 ELSE 0 END) AS BIGINT)
        |         AS returning_users
        |FROM presence p JOIN first f USING (user_id)
        |GROUP BY p.week
        |ORDER BY p.week""".stripMargin,
    "event_stickiness" ->
      """WITH presence AS (
        |  SELECT DISTINCT user_id,
        |         CAST(date_trunc('week', CAST(ts AS TIMESTAMP))
        |           AS TIMESTAMP) AS week
        |  FROM events),
        |wau AS (
        |  SELECT week, CAST(count(*) AS BIGINT) AS wau
        |  FROM presence GROUP BY 1),
        |contrib AS (
        |  SELECT DISTINCT p.user_id, w.week
        |  FROM presence p
        |  JOIN wau w ON w.week >= p.week
        |            AND w.week <= p.week + INTERVAL 21 DAY),
        |mau AS (
        |  SELECT week, CAST(count(*) AS BIGINT) AS mau4
        |  FROM contrib GROUP BY 1)
        |SELECT wau.week, wau.wau, mau.mau4,
        |       1000 * wau.wau // mau.mau4 AS stickiness_milli
        |FROM wau JOIN mau USING (week)
        |ORDER BY week""".stripMargin,
    "ts_ewma" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |l AS (
        |  SELECT user_id, event_id, ts, value, cents,
        |         lag(cents, 1) OVER w AS c1, lag(cents, 2) OVER w AS c2,
        |         lag(cents, 3) OVER w AS c3, lag(cents, 4) OVER w AS c4,
        |         lag(cents, 5) OVER w AS c5, lag(cents, 6) OVER w AS c6,
        |         lag(cents, 7) OVER w AS c7
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |f AS (
        |  SELECT user_id, event_id, ts, value,
        |         cents * 128 + coalesce(c1, 0) * 64 + coalesce(c2, 0) * 32
        |           + coalesce(c3, 0) * 16 + coalesce(c4, 0) * 8
        |           + coalesce(c5, 0) * 4 + coalesce(c6, 0) * 2
        |           + coalesce(c7, 0) AS num,
        |         128 + CASE WHEN c1 IS NULL THEN 0 ELSE 64 END
        |             + CASE WHEN c2 IS NULL THEN 0 ELSE 32 END
        |             + CASE WHEN c3 IS NULL THEN 0 ELSE 16 END
        |             + CASE WHEN c4 IS NULL THEN 0 ELSE 8 END
        |             + CASE WHEN c5 IS NULL THEN 0 ELSE 4 END
        |             + CASE WHEN c6 IS NULL THEN 0 ELSE 2 END
        |             + CASE WHEN c7 IS NULL THEN 0 ELSE 1 END AS den
        |  FROM l)
        |SELECT user_id, event_id, ts, value,
        |       CAST(num * 100 // den AS DOUBLE) / 10000.0 AS ewma
        |FROM f ORDER BY user_id, event_id""".stripMargin,
    "event_ab_lift" ->
      """WITH np AS (
        |  SELECT user_id,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS np
        |  FROM events GROUP BY user_id),
        |per AS (
        |  SELECT user_id,
        |         CASE WHEN np >= 14 THEN 1 ELSE 0 END AS converted,
        |         user_id % 2 AS variant
        |  FROM np),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_control,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_treat,
        |    CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END)
        |         AS BIGINT) AS conv_control,
        |    CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END)
        |         AS BIGINT) AS conv_treat
        |  FROM per),
        |m AS (
        |  SELECT *,
        |         CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE)
        |           AS cvr_c,
        |         CAST(conv_treat AS DOUBLE) / CAST(n_treat AS DOUBLE)
        |           AS cvr_t,
        |         CAST(conv_control + conv_treat AS DOUBLE)
        |           / CAST(n_control + n_treat AS DOUBLE) AS p_pool
        |  FROM c),
        |z AS (
        |  SELECT *,
        |         CASE WHEN p_pool > 0.0 AND p_pool < 1.0
        |              THEN round((cvr_t - cvr_c) /
        |                   sqrt(p_pool * (1.0 - p_pool) *
        |                        (1.0 / CAST(n_control AS DOUBLE)
        |                         + 1.0 / CAST(n_treat AS DOUBLE))), 4)
        |              ELSE NULL END AS z
        |  FROM m)
        |SELECT n_control, n_treat, conv_control, conv_treat,
        |       CAST(conv_control * 10000 // n_control AS DOUBLE) / 10000.0
        |         AS cvr_control,
        |       CAST(conv_treat * 10000 // n_treat AS DOUBLE) / 10000.0
        |         AS cvr_treat,
        |       CAST(conv_treat * 10000 // n_treat
        |            - conv_control * 10000 // n_control AS DOUBLE)
        |         / 10000.0 AS lift,
        |       z, coalesce(abs(z) > 1.96, false) AS significant
        |FROM z""".stripMargin,
    "ts_resample_linear" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08'),
        |h AS (
        |  SELECT user_id,
        |         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
        |         arg_max(value, ts) AS v_obs
        |  FROM ev GROUP BY 1, 2),
        |n AS (
        |  SELECT *, lead(hr) OVER w AS next_hr, lead(v_obs) OVER w AS next_v
        |  FROM h WINDOW w AS (PARTITION BY user_id ORDER BY hr)),
        |g AS (
        |  SELECT user_id, hr, v_obs, next_hr, next_v,
        |         unnest(range(hr, coalesce(next_hr, hr + INTERVAL 1 HOUR),
        |                      INTERVAL 1 HOUR)) AS hr_out
        |  FROM n),
        |f AS (
        |  SELECT user_id, hr_out,
        |         CAST(round(v_obs * 100) AS BIGINT) AS cents,
        |         CAST(round(coalesce(next_v, v_obs) * 100) AS BIGINT)
        |           AS next_cents,
        |         (epoch_us(hr_out) - epoch_us(hr)) // 3600000000 AS d_h,
        |         CASE WHEN next_hr IS NULL THEN NULL
        |              ELSE (epoch_us(next_hr) - epoch_us(hr)) // 3600000000
        |              END AS gap_h
        |  FROM g)
        |SELECT user_id, hr_out AS hr,
        |       CAST(CASE WHEN gap_h IS NULL THEN cents * 100
        |                 ELSE (cents * (gap_h - d_h)
        |                       + next_cents * d_h) * 100 // gap_h
        |            END AS DOUBLE) / 10000.0 AS value_interp
        |FROM f ORDER BY user_id, hr""".stripMargin,
    "event_anomaly_zscore" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
        |           AS day,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type,
        |         count(*) AS n_days,
        |         CAST(sum(n) AS BIGINT) AS sum_n,
        |         CAST(sum(n * n) AS BIGINT) AS sum_n2
        |  FROM daily GROUP BY 1),
        |m AS (
        |  SELECT event_type,
        |         CAST(sum_n AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean,
        |         CASE WHEN n_days > 1 THEN
        |           (CAST(sum_n2 AS DOUBLE)
        |              - CAST(sum_n AS DOUBLE) * CAST(sum_n AS DOUBLE)
        |                / CAST(n_days AS DOUBLE))
        |             / (CAST(n_days AS DOUBLE) - 1.0)
        |         ELSE NULL END AS variance
        |  FROM st),
        |zz AS (
        |  SELECT daily.event_type, day, n,
        |         CASE WHEN variance > 0.0
        |              THEN round((CAST(n AS DOUBLE) - mean)
        |                         / sqrt(variance), 4)
        |              ELSE NULL END AS z
        |  FROM daily JOIN m ON daily.event_type = m.event_type)
        |SELECT event_type, day, n, z,
        |       coalesce(abs(z) > 2.0, false) AS flagged
        |FROM zz ORDER BY event_type, day""".stripMargin,
    "event_cooccur_pmi" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |m AS (
        |  SELECT *, lag(epoch_us(ts)) OVER w AS prev_us FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, event_type,
        |         CAST(sum(CASE WHEN prev_us IS NULL
        |                         OR epoch_us(ts) - prev_us > 1800000000
        |                       THEN 1 ELSE 0 END) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS session_id
        |  FROM m),
        |st AS (SELECT DISTINCT user_id, session_id, event_type FROM sess),
        |pairs AS (
        |  SELECT x.event_type AS a, y.event_type AS b, count(*) AS n_ab
        |  FROM st x JOIN st y
        |    ON x.user_id = y.user_id AND x.session_id = y.session_id
        |  WHERE x.event_type < y.event_type
        |  GROUP BY 1, 2),
        |tc AS (SELECT event_type AS t, count(*) AS n_t FROM st GROUP BY 1),
        |tot AS (SELECT count(*) AS n_sessions
        |        FROM (SELECT DISTINCT user_id, session_id FROM st))
        |SELECT a, b, n_ab, ta.n_t AS n_a, tb.n_t AS n_b,
        |       round(ln(CAST(n_ab AS DOUBLE) * CAST(n_sessions AS DOUBLE)
        |             / (CAST(ta.n_t AS DOUBLE) * CAST(tb.n_t AS DOUBLE))), 4)
        |         AS pmi
        |FROM pairs, tot, tc ta, tc tb
        |WHERE ta.t = a AND tb.t = b
        |ORDER BY a, b""".stripMargin,
    "event_funnel_windowed" ->
      """WITH s1 AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_signup
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |p1 AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_purchase
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND CAST(e.ts AS TIMESTAMP) > s1.t_signup
        |  GROUP BY e.user_id),
        |j AS (
        |  SELECT s1.user_id, t_signup, t_purchase,
        |         t_purchase IS NOT NULL
        |           AND t_purchase <= t_signup + INTERVAL 7 DAY AS converted
        |  FROM s1 LEFT JOIN p1 ON s1.user_id = p1.user_id)
        |SELECT CAST(date_trunc('day', t_signup) AS TIMESTAMP) AS cohort_day,
        |       count(*) AS n_signups,
        |       CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_converted_7d,
        |       CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) AS cvr_7d
        |FROM j GROUP BY 1 ORDER BY cohort_day""".stripMargin,
    "event_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |m AS (
        |  SELECT *, lag(epoch_us(ts)) OVER w AS prev_us FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, event_type,
        |         CAST(sum(CASE WHEN prev_us IS NULL
        |                         OR epoch_us(ts) - prev_us > 1800000000
        |                       THEN 1 ELSE 0 END) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS session_id
        |  FROM m)
        |SELECT user_id, session_id,
        |       min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events,
        |       count(DISTINCT event_type) AS n_types,
        |       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "cdc_snapshot_diff" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |old AS (
        |  SELECT user_id, event_type AS old_state, ts AS old_ts FROM e
        |  WHERE ts < TIMESTAMP '2024-01-15'
        |  QUALIFY row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1),
        |new AS (
        |  SELECT user_id, event_type AS new_state, ts AS new_ts FROM e
        |  QUALIFY row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1)
        |SELECT COALESCE(o.user_id, n.user_id) AS user_id,
        |       old_state, old_ts, new_state, new_ts,
        |       CASE WHEN o.user_id IS NULL THEN 'insert'
        |            WHEN n.user_id IS NULL THEN 'delete'
        |            WHEN o.old_state <> n.new_state
        |              OR o.old_ts <> n.new_ts THEN 'update'
        |            ELSE 'unchanged' END AS status
        |FROM old o FULL JOIN new n ON o.user_id = n.user_id
        |ORDER BY user_id""".stripMargin,
    "dim_scd2" -> scd2OracleSql,
    // The merge is DEFINED by its equivalence to the full rebuild: the
    // incremental query must reproduce dim_scd2's output bit for bit, so
    // it shares the rebuild oracle verbatim.
    "dim_scd2_merge" -> scd2OracleSql,
    "event_attribution_decay" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |seg AS (
        |  SELECT *, COALESCE(sum(CASE WHEN event_type = 'purchase'
        |                             THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS seg
        |  FROM e),
        |t AS (
        |  SELECT user_id, seg, event_id, event_type, ts FROM seg
        |  WHERE event_type IN ('click', 'view')),
        |p AS (
        |  SELECT user_id, seg, event_id AS purchase_id, ts AS purchase_ts
        |  FROM seg WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT t.event_type, t.user_id, p.purchase_id,
        |         (CAST(1 AS BIGINT) << CAST(30 - least(
        |            date_diff('day', CAST(t.ts AS DATE),
        |                      CAST(p.purchase_ts AS DATE)), 30) AS INT))
        |           AS weight,
        |         row_number() OVER (PARTITION BY t.user_id, p.purchase_id
        |                            ORDER BY t.ts DESC, t.event_id DESC)
        |           AS recency
        |  FROM t JOIN p ON t.user_id = p.user_id AND t.seg = p.seg),
        |b AS (
        |  SELECT event_type, purchase_id, recency,
        |         10000 * weight // (sum(weight)
        |           OVER (PARTITION BY user_id, purchase_id)) AS base_bps
        |  FROM r),
        |c AS (
        |  SELECT event_type AS channel, purchase_id,
        |         base_bps + CASE WHEN recency = 1
        |           THEN 10000 - sum(base_bps)
        |             OVER (PARTITION BY purchase_id)
        |           ELSE 0 END AS credit_bps
        |  FROM b)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |       CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_conversions,
        |       CAST(sum(credit_bps) AS BIGINT) AS credit_bps
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "event_attribution_position" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |seg AS (
        |  SELECT *, COALESCE(sum(CASE WHEN event_type = 'purchase'
        |                             THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS seg
        |  FROM e),
        |t AS (
        |  SELECT user_id, seg, event_id, event_type, ts FROM seg
        |  WHERE event_type IN ('click', 'view')),
        |p AS (
        |  SELECT user_id, seg, event_id AS purchase_id FROM seg
        |  WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT t.event_type, t.ts, t.event_id, p.purchase_id, t.user_id,
        |         row_number() OVER (PARTITION BY t.user_id, p.purchase_id
        |                            ORDER BY t.ts, t.event_id) AS pos,
        |         count(*) OVER (PARTITION BY t.user_id, p.purchase_id) AS n
        |  FROM t JOIN p ON t.user_id = p.user_id AND t.seg = p.seg),
        |c AS (
        |  SELECT event_type AS channel, purchase_id,
        |         CASE WHEN n = 1 THEN 10000
        |              WHEN n = 2 THEN 5000
        |              WHEN pos = 1 OR pos = n THEN 4000
        |              WHEN pos = 2 THEN 2000 // (n - 2) + 2000 % (n - 2)
        |              ELSE 2000 // (n - 2) END AS credit_bps
        |  FROM r)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |       CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_conversions,
        |       CAST(sum(credit_bps) AS BIGINT) AS credit_bps
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "event_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_signup
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_view
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND CAST(e.ts AS TIMESTAMP) > s1.t_signup
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_purchase
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t_view
        |  GROUP BY e.user_id)
        |SELECT s1.user_id, t_signup, t_view, t_purchase,
        |       1 + CASE WHEN t_view IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END AS stage
        |FROM s1
        |LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id
        |ORDER BY s1.user_id""".stripMargin,
    "event_attribution" ->
      """SELECT user_id, event_id, purchase_ts, touch_type, touch_ts FROM (
        |  SELECT user_id, event_id, event_type,
        |         CAST(ts AS TIMESTAMP) AS purchase_ts,
        |         last_value(CASE WHEN event_type IN ('click', 'view')
        |                         THEN event_type END IGNORE NULLS)
        |           OVER w AS touch_type,
        |         last_value(CASE WHEN event_type IN ('click', 'view')
        |                         THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
        |           OVER w AS touch_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,
    // the segmented form's contract is VALUE-IDENTITY with the plain
    // window form — same oracle text
    "event_attribution_segmented" ->
      """SELECT user_id, event_id, purchase_ts, touch_type, touch_ts FROM (
        |  SELECT user_id, event_id, event_type,
        |         CAST(ts AS TIMESTAMP) AS purchase_ts,
        |         last_value(CASE WHEN event_type IN ('click', 'view')
        |                         THEN event_type END IGNORE NULLS)
        |           OVER w AS touch_type,
        |         last_value(CASE WHEN event_type IN ('click', 'view')
        |                         THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
        |           OVER w AS touch_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,
    "event_path_trigrams" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS step1,
        |         lead(event_type, 1) OVER w AS step2,
        |         lead(event_type, 2) OVER w AS step3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT step1, step2, step3, count(*) AS n,
        |       count(DISTINCT user_id) AS n_users
        |FROM seq WHERE step3 IS NOT NULL
        |GROUP BY step1, step2, step3
        |ORDER BY n DESC, step1, step2, step3""".stripMargin,
    "event_retention" ->
      """WITH cohorts AS (
        |  SELECT user_id,
        |         date_trunc('week', min(CAST(ts AS TIMESTAMP)))
        |           AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id,
        |         date_trunc('week', CAST(ts AS TIMESTAMP)) AS a_week
        |  FROM events),
        |joined AS (
        |  SELECT c.user_id, c.cohort_week,
        |         CAST(date_diff('day', c.cohort_week, a.a_week) // 7
        |              AS INTEGER) AS week_offset
        |  FROM cohorts c JOIN activity a ON c.user_id = a.user_id
        |  WHERE a.a_week >= c.cohort_week),
        |sized AS (
        |  SELECT cohort_week, count(DISTINCT user_id) AS cohort_size
        |  FROM joined GROUP BY cohort_week)
        |SELECT CAST(j.cohort_week AS TIMESTAMP) AS cohort_week,
        |       j.week_offset,
        |       count(DISTINCT j.user_id) AS n_active,
        |       s.cohort_size,
        |       CAST(count(DISTINCT j.user_id) AS DOUBLE)
        |         / CAST(s.cohort_size AS DOUBLE) AS retention_pct
        |FROM joined j JOIN sized s ON j.cohort_week = s.cohort_week
        |GROUP BY j.cohort_week, j.week_offset, s.cohort_size
        |ORDER BY cohort_week, j.week_offset""".stripMargin,
    "ts_ohlc_bars" ->
      """SELECT user_id,
        |       CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
        |         AS day,
        |       arg_min(value, ts) AS open,
        |       max(value) AS high,
        |       min(value) AS low,
        |       arg_max(value, ts) AS close,
        |       count(*) AS n_ticks
        |FROM events
        |GROUP BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
        |ORDER BY user_id, day""".stripMargin,
    "ts_gapfill_locf" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE ts < TIMESTAMP '2024-01-08'),
        |hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr,
        |         arg_max(value, ts) AS v_obs
        |  FROM ev GROUP BY user_id, date_trunc('hour', ts)),
        |bounds AS (
        |  SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |         date_trunc('hour', max(ts)) AS h1
        |  FROM ev GROUP BY user_id),
        |grid AS (
        |  SELECT user_id,
        |         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        |  FROM bounds)
        |SELECT g.user_id, g.hr,
        |       last_value(h.v_obs IGNORE NULLS) OVER (
        |         PARTITION BY g.user_id ORDER BY g.hr
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS value_locf
        |FROM grid g
        |LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hr = g.hr
        |ORDER BY g.user_id, g.hr""".stripMargin
  )
}
