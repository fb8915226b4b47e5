package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Window-function operators (SURVEY.md §2b "Window functions").
  *
  * The reference's monotonic `COUNTER` (reference README.md:88) is morally a
  * row_number, and its lost/duplicated-offset analysis (README.md:94–99) is
  * a lag/lead gap check — `win_lag_lead` turns that manual audit into a
  * query.
  *
  * Scale notes: the per-customer/per-user windows partition by a
  * high-cardinality key — one hash shuffle on the partition key, then a
  * per-partition sort; no global single-partition window anywhere (that
  * would serialize 100 TB through one task). The two queries whose
  * SEMANTIC partition key is low-cardinality (`win_distribution`: 5 market
  * segments; `win_rank_dense`: 25 brands) do NOT use a key-partitioned
  * window at all — a 5-way window is a parallelism ceiling of 5 tasks at
  * any scale. They run through [[spreadRank]], a two-pass formulation
  * whose parallelism is the partition count, independent of key
  * cardinality. Running/sliding sums run in DECIMAL (exact) and cast to
  * DOUBLE at the edge for oracle parity.
  */
object WindowOps extends OpModule {

  /** Parallelism for [[spreadRank]]'s range pass: the session's shuffle
    * width (the knob a cluster operator already sizes to the data).
    */
  private def spreadParts(s: SparkSession): Int =
    s.sessionState.conf.numShufflePartitions

  /** Two-pass scalable rank: global 1-based row number (`__rn`) and group
    * total (`__n`) within `partKey` in `orderCols` order — with the heavy
    * per-row work spread across `parts` tasks regardless of how few
    * distinct `partKey` values exist (a key-partitioned window serializes
    * each key through ONE task — a straggler by construction when the key
    * has 5 values and the table has 10^10 rows).
    *
    * Pass 1: `repartitionByRange(parts, partKey +: orderCols)` makes the
    * physical partition id monotone in the total sort order, so a row's
    * global rank = (rows of its key in earlier partitions) + (its local
    * rank). The local rank is a window over (`__pid`, partKey) —
    * cardinality parts × keys, never a straggler. `orderCols` must be a
    * total order within the key (callers append a unique tiebreaker) so
    * the output is deterministic under any partition boundaries.
    *
    * Pass 2: per-(pid, key) counts collapse to a parts × keys metadata
    * frame; cumulative offsets over it (a window over metadata, not data)
    * broadcast-join back. Both passes hang off the same range exchange —
    * Spark materializes it once and replays it (ReusedExchange, asserted
    * in PlanAuditSpec), which also guarantees both passes see identical
    * sampled range boundaries. AQE never coalesces an explicit
    * `repartitionByRange(n, ...)`, so the pid column stays consistent
    * across the two reads.
    *
    * With `weight` set, also emits `__pre`: the inclusive running sum of
    * the weight column in the same order (same offsets machinery) — the
    * prefix counts a tie-aware rank needs — and `__tw`: the per-key total
    * weight, computed in the same metadata window as `__n` so callers
    * needing a denominator (weighted percentiles) don't pay a second
    * aggregate + join over the data.
    */
  private[graft] def spreadRank(df: DataFrame, partKey: String,
      orderCols: Seq[Column], parts: Int,
      weight: Option[String] = None): DataFrame = {
    val sortExprs = col(partKey) +: orderCols
    val ranged = df.repartitionByRange(parts, sortExprs: _*)
      .withColumn("__pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("__pid"), col(partKey))
      .orderBy(orderCols: _*)
    val wRun = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local0 = ranged.withColumn("__lrn", row_number().over(wLoc).cast("long"))
    val local = weight.fold(local0)(w =>
      local0.withColumn("__lpre", sum(col(w)).over(wRun)))
    val aggs = count(lit(1)).as("__c") +:
      weight.toSeq.map(w => sum(col(w)).as("__w"))
    val counts = local.groupBy(col("__pid"), col(partKey))
      .agg(aggs.head, aggs.tail: _*)
    val before = Window.partitionBy(col(partKey)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy(col(partKey))
    val off0 = counts
      .withColumn("__rn_off", coalesce(sum(col("__c")).over(before), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(whole))
    val off = weight.fold(off0)(_ =>
      off0.withColumn("__w_off", coalesce(sum(col("__w")).over(before), lit(0L)))
        .withColumn("__tw", sum(col("__w")).over(whole)))
    val offCols = Seq("__pid", partKey, "__rn_off", "__n") ++
      weight.toSeq.flatMap(_ => Seq("__w_off", "__tw"))
    val joined = local
      .join(broadcast(off.select(offCols.map(col): _*)), Seq("__pid", partKey))
      .withColumn("__rn", col("__rn_off") + col("__lrn"))
    weight.fold(joined)(_ =>
      joined.withColumn("__pre", col("__w_off") + col("__lpre")))
      .drop("__pid", "__lrn", "__lpre", "__rn_off", "__w_off")
  }

  /** Latest 3 orders per customer — the dedup-rank pattern. */
  def rowNumber(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** rank vs dense_rank with real ties (price-only ordering within brand).
    *
    * p_brand has 25 values, so `Window.partitionBy(p_brand)` would cap
    * parallelism at 25 tasks forever. Instead: aggregate to the distinct
    * (brand, price) keys with multiplicities (a scalable hash agg — ranks
    * are per-KEY facts, every tied row shares them), [[spreadRank]] the
    * key frame weighted by multiplicity (rank of a key = rows strictly
    * above it + 1 = inclusive prefix − own count + 1; dense_rank = the
    * key's global index), and hash-join the two ranks back on the
    * high-cardinality (brand, price) key. Output is value-identical to
    * the window form (the unit spec asserts it, ties included).
    */
  def rankDense(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
    val grouped = base.groupBy(col("p_brand"), col("p_retailprice"))
      .agg(count(lit(1)).as("__c"))
    val ranked = spreadRank(grouped, "p_brand",
      Seq(col("p_retailprice").desc), spreadParts(s), weight = Some("__c"))
      .withColumn("price_rank", (col("__pre") - col("__c") + 1).cast("int"))
      .withColumn("price_dense", col("__rn").cast("int"))
      .select(col("p_brand"), col("p_retailprice"),
        col("price_rank"), col("price_dense"))
    base.join(ranked, Seq("p_brand", "p_retailprice"))
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        col("price_rank"), col("price_dense"))
      .orderBy(col("p_partkey"))
  }

  /** Gap detection per user: time to previous/next event — the reference's
    * lost-offset audit (README.md:94–99) as lag/lead.
    */
  def lagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(col("prev_ts")))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("prev_ts"), col("next_ts"), col("gap_us"))
      .orderBy(col("event_id"))
  }

  /** Running total spend per customer (frame: unbounded preceding → current).
    */
  def runningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("running_spend",
        sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).over(w)
          .cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** [[runningSum]] in SEGMENTED form — the prefix-ADDITIVE member of
    * the hot-key-proof window pair (see
    * [[EventOps.attributionSegmented]] for the prefix-idempotent
    * `last` member; together they cover the two algebraic shapes a
    * running window can take). The plain form sorts each customer's
    * whole history in one task; here the window runs per
    * (customer, order-month) segment, the per-segment DECIMAL totals
    * aggregate order-free with map-side combine, a per-customer prefix
    * sum over the tiny month grid (≤ months rows per customer) carries
    * the balance across segments, and each row adds its within-segment
    * running sum to the carried balance. Exact by associativity of
    * DECIMAL addition — every prefix of a customer's orders splits
    * into (complete prior months, in-month prefix) — and certified by
    * the SAME `win_running_sum` oracle, value for value.
    */
  def runningSumSegmented(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        expr("CAST(o_totalprice AS DECIMAL(18,2))").as("price"))
      .withColumn("seg",
        year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
    val wSeg = Window.partitionBy(col("o_custkey"), col("seg"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = o.withColumn("w_sum", sum(col("price")).over(wSeg))
    val totals = o.groupBy(col("o_custkey"), col("seg"))
      .agg(sum(col("price")).as("seg_total"))
    val wPrefix = Window.partitionBy(col("o_custkey"))
      .orderBy(col("seg"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = totals
      .withColumn("carry", sum(col("seg_total")).over(wPrefix))
      .select(col("o_custkey"), col("seg"), col("carry"))
    within.join(carried, Seq("o_custkey", "seg"))
      .withColumn("running_spend",
        (col("w_sum") +
          coalesce(col("carry"), lit(0).cast("decimal(18,2)")))
          .cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Sliding 3-row average spend per customer. avg is computed as exact
    * DECIMAL sum / count so both engines divide the same two numbers.
    */
  def slidingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("win_sum",
        sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).over(w)
          .cast("double"))
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("sliding_avg", col("win_sum") / col("win_n"))
      .select(col("o_custkey"), col("o_orderkey"), col("sliding_avg"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Time-RANGE frame: trailing-30-day average spend per customer — a
    * value-based frame (all rows within 30 days), not a row-count frame.
    */
  def rangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-30L * 86400, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("t30_sum",
        sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).over(w)
          .cast("double"))
      .withColumn("t30_n", count(lit(1)).over(w))
      .withColumn("trailing_avg", col("t30_sum") / col("t30_n"))
      .select(col("o_custkey"), col("o_orderkey"), col("trailing_avg"),
        col("t30_n"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Distribution functions: quartile bucket, percent_rank, cume_dist of
    * customers by balance within market segment.
    *
    * c_mktsegment has 5 values — a `Window.partitionBy(c_mktsegment)`
    * serializes each segment through one task (a hard parallelism ceiling
    * of 5 at any scale). All three functions are pure arithmetic over
    * (row number, segment total), so they derive from [[spreadRank]]:
    *   percent_rank = (rank−1)/(n−1)   (0 when n = 1, per SQL spec)
    *   cume_dist    = rows_le / n
    *   ntile(4)     = the first n%4 buckets take ⌈n/4⌉ rows, the rest ⌊n/4⌋
    * The ordering key (c_acctbal, c_custkey) is a total order (custkey is
    * unique), so rank = row number and rows_le = row number — the tie-aware
    * general case is the [[rankDense]] machinery. Integer formulas
    * reproduce Spark's and DuckDB's ntile bit-for-bit; the two double
    * divisions see the same integer operands as the built-ins, so the
    * doubles are bit-identical too (the driver hash-compares them).
    */
  def distribution(s: SparkSession, dir: String): DataFrame = {
    val ranked = spreadRank(
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")),
      "c_mktsegment", Seq(col("c_acctbal"), col("c_custkey")),
      spreadParts(s))
    val rn = col("__rn")
    val n = col("__n")
    // integer `div`, not `/`: double division can round across a bucket
    // boundary at large n. The ELSE branch is unreachable when n < 4
    // (⌊n/4⌋ = 0), so its div-by-zero never evaluates.
    val quartile = expr(
      """CASE WHEN __rn <= ((__n div 4) + 1) * (__n % 4)
        |     THEN (__rn - 1) div ((__n div 4) + 1) + 1
        |     ELSE (__n % 4)
        |          + ((__rn - 1) - ((__n div 4) + 1) * (__n % 4))
        |            div (__n div 4) + 1
        |END""".stripMargin)
    ranked.select(
      col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
      quartile.cast("int").as("quartile"),
      when(n === 1, lit(0.0))
        .otherwise((rn - 1).cast("double") / (n - 1).cast("double"))
        .as("pct_rank"),
      rn.cast("double").divide(n.cast("double")).as("cume"))
      .orderBy(col("c_custkey"))
  }

  /** Value window functions: first/last/nth order value per customer
    * (frame pinned to the whole partition so last_value is the true last).
    */
  def valueFns(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Sliding DISTINCT count: how many distinct event types each user's
    * trailing 5 events span — the variety/engagement signal a plain
    * sliding count can't give. Spark has no DISTINCT window aggregate,
    * so the engine form is `size(array_distinct(collect_list))` over the
    * rows frame — per-row state bounded by the 5-row frame — while the
    * DuckDB twin uses its native `count(DISTINCT) OVER`, an independent
    * route to the same values. One user_id exchange + sort; frame state
    * is 5 entries regardless of history length.
    */
  def slidingDistinct(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-4, org.apache.spark.sql.expressions.Window.currentRow)
    graft.Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"))
      .withColumn("n_distinct_5",
        size(array_distinct(collect_list(col("event_type")).over(w)))
          .cast("long"))
      .orderBy(col("event_id"))
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE same-type events per
    * user (streaks) — the canonical SQL shape behind "3 errors in a
    * row", habit streaks, and sensor-state episodes, and the standalone
    * form of the run-collapse [[graft.operators.TextOps]]' BPE merge and
    * [[graft.operators.EventOps]].scd2 use internally. The island id is
    * the running count of type-CHANGE flags (lag ≠ current), so both
    * window passes (the lag and the running sum) ride ONE
    * (user_id)-exchange and ONE (ts, event_id) sort; the per-island
    * collapse is a map-side-combinable aggregate keyed (user, island).
    * Only streaks of length ≥ 3 are emitted (the interesting tail —
    * bounds the output without changing determinism: ordering inside a
    * user is total via (ts, event_id)).
    */
  def gapsIslands(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    graft.Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w) === col("event_type"), 0L)
          .otherwise(1L))
      .withColumn("island", sum(col("chg")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("event_type")).as("event_type"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        min(col("event_id")).as("first_event_id"),
        count(lit(1)).as("streak_len"))
      .filter(col("streak_len") >= 3)
      .select(col("user_id"), col("island"), col("event_type"),
        col("start_ts"), col("end_ts"), col("first_event_id"),
        col("streak_len"))
      .orderBy(col("user_id"), col("island"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_gaps_islands" -> gapsIslands,
    "win_sliding_distinct" -> slidingDistinct,
    "win_row_number" -> rowNumber,
    "win_rank_dense" -> rankDense,
    "win_lag_lead" -> lagLead,
    "win_running_sum" -> runningSum,
    "win_running_sum_segmented" -> runningSumSegmented,
    "win_sliding_avg" -> slidingAvg,
    "win_range_frame" -> rangeFrame,
    "win_distribution" -> distribution,
    "win_value_fns" -> valueFns
  )

  val oracle: Map[String, String] = Map(
    "win_gaps_islands" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |         event_type
        |  FROM events),
        |flagged AS (
        |  SELECT *,
        |         CASE WHEN lag(event_type, 1) OVER w = event_type
        |              THEN 0 ELSE 1 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |                      ORDER BY ts, event_id)),
        |islands AS (
        |  SELECT *,
        |         CAST(sum(chg) OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS island
        |  FROM flagged)
        |SELECT user_id, island, min(event_type) AS event_type,
        |       min(ts) AS start_ts, max(ts) AS end_ts,
        |       min(event_id) AS first_event_id,
        |       count(*) AS streak_len
        |FROM islands
        |GROUP BY user_id, island
        |HAVING count(*) >= 3
        |ORDER BY user_id, island""".stripMargin,
    "win_sliding_distinct" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |       CAST(count(DISTINCT event_type) OVER (
        |         PARTITION BY user_id
        |         ORDER BY CAST(ts AS TIMESTAMP), event_id
        |         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS n_distinct_5
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "win_row_number" ->
      """SELECT o_custkey, rn, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey) rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_rank_dense" ->
      """SELECT p_partkey, p_brand, p_retailprice,
        |       rank() OVER (PARTITION BY p_brand
        |                    ORDER BY p_retailprice DESC) AS price_rank,
        |       dense_rank() OVER (PARTITION BY p_brand
        |                          ORDER BY p_retailprice DESC) AS price_dense
        |FROM part ORDER BY p_partkey""".stripMargin,
    "win_lag_lead" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |       CAST(lag(ts, 1) OVER w AS TIMESTAMP) AS prev_ts,
        |       CAST(lead(ts, 1) OVER w AS TIMESTAMP) AS next_ts,
        |       date_diff('microsecond',
        |                 CAST(lag(ts, 1) OVER w AS TIMESTAMP),
        |                 CAST(ts AS TIMESTAMP)) AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey
        |                  ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    // the segmented form's contract is VALUE-IDENTITY with the plain
    // window form — same oracle text
    "win_running_sum_segmented" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey
        |                  ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_sliding_avg" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |         / (COUNT(*) OVER w) AS sliding_avg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |         / (COUNT(*) OVER w) AS trailing_avg,
        |       COUNT(*) OVER w AS t30_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_value_fns" ->
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_totalprice) OVER w AS first_price,
        |       last_value(o_totalprice) OVER w AS last_price,
        |       nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_distribution" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |       ntile(4) OVER w AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin
  )
}
