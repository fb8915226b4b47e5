package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Join operators (SURVEY.md §2b "Joins" — none exist in the reference;
  * declared per the north star over the harness tables).
  *
  * Scale notes (100 TB):
  *  - `join_inner_equi` is the canonical shuffle hash/sort-merge join on the
  *    fact-table key; both sides hash-partition on l_orderkey/o_orderkey, AQE
  *    picks SMJ vs shuffled-hash and coalesces post-shuffle partitions.
  *  - `join_broadcast` pins the dimension side with `broadcast()` — nation
  *    (25 rows) and region (5 rows) stay tiny at every SF, so the fact side
  *    is never shuffled at all.
  *  - semi/anti joins ship only the key column of the build side.
  *  - `join_range_theta` keeps the equi key (user_id) in the join condition
  *    so Spark plans a partitioned join with the range as a post-condition,
  *    NOT a cartesian product.
  *  - `join_asof` is expressed as a window (`last(..., ignoreNulls)` over
  *    rows-preceding) — one shuffle on user_id, no self-join blowup.
  */
object JoinOps extends OpModule {

  /** Fact⋈fact equi join: lineitem ⋈ orders on orderkey. */
  def innerEqui(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("o_custkey"), col("o_totalprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Star join through two broadcast dims, rolled up per region/nation.
    * Money sums go through DECIMAL so Spark and DuckDB agree bit-for-bit
    * (double += is order-dependent; decimal is exact).
    */
  def broadcastDims(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_cust"),
        expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)")
          .as("sum_acctbal"))
      .orderBy(col("r_name"), col("n_name"))

  /** Left outer: every customer, with order count/spend (NULL spend when no
    * orders — preserved, not coalesced, to exercise outer-join semantics).
    */
  def leftOuter(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"),
        "left_outer")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
          .as("spend"))
      .orderBy(col("c_custkey"))

  /** Left semi = EXISTS: customers that placed at least one order. */
  def semi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"),
        "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Left anti = NOT EXISTS: customers with no high-value (>300k) order.
    * The build-side filter keeps the broadcast/shuffle side small AND makes
    * the result non-trivial (every customer has *some* order in the data).
    */
  def anti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Range/theta join with an equi anchor: pairs of events by the same user
    * where b follows a within one hour. The user_id equality keeps this a
    * partitioned join (range is a post-filter), never a cartesian product.
    */
  def rangeTheta(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.events(s, dir).select(
      col("user_id").as("a_user"), col("ts").as("a_ts"),
      col("event_type").as("type_a"))
    val b = Tables.events(s, dir).select(
      col("user_id").as("b_user"), col("ts").as("b_ts"),
      col("event_type").as("type_b"))
    a.join(b, col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** As-of join: for each event, the timestamp of the same user's most
    * recent STRICTLY PRIOR 'signup' event. Window emulation (SURVEY.md §2b):
    * one shuffle on user_id instead of a self range-join.
    */
  def asOf(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("prev_signup_ts",
        last(when(col("event_type") === "signup", col("ts")),
          ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("prev_signup_ts"))
      .orderBy(col("event_id"))
  }

  /** Forward as-of join WITH TOLERANCE: for each event, the same user's
    * NEXT 'signup' timestamp — but only if it lands within 24 hours,
    * else NULL (the pandas `merge_asof(direction='forward',
    * tolerance=…)` contract; untolerated forward as-of would claim a
    * signup weeks later "follows" an event, which no attribution window
    * accepts). Completes the as-of triple beside [[asOf]] (backward) and
    * [[asOfNearest]]: same one-exchange-one-sort plan — the forward
    * `first` over the following frame rides the identical (user_id)
    * window, and the tolerance is a post-window scalar comparison in
    * exact microseconds.
    */
  def asOfForward(s: SparkSession, dir: String): DataFrame = {
    val sig = when(col("event_type") === "signup", col("ts"))
    val fwd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    Tables.events(s, dir)
      .withColumn("next_sig", first(sig, ignoreNulls = true).over(fwd))
      .withColumn("next_signup_ts",
        when(unix_micros(col("next_sig")) - unix_micros(col("ts")) <=
          86400L * 1000000L, col("next_sig")))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("next_signup_ts"))
      .orderBy(col("event_id"))
  }

  /** Nearest as-of join: for each event, the same user's CLOSEST 'signup'
    * timestamp in either direction (ties → the earlier one; the event
    * itself is excluded, so a signup event finds its nearest OTHER
    * signup). The sensor-alignment flavor of [[asOf]] — "match each
    * reading to the closest calibration point", where backward-only
    * as-of mis-assigns everything before the first calibration.
    *
    * Scale shape: the backward pass (`last` over the preceding frame) and
    * the forward pass (`first` over the following frame) share ONE
    * partition + sort, so Catalyst plans one exchange and one sort for
    * both WindowExecs — still strictly cheaper than any range self-join
    * formulation, and `user_id` keys it to data-scaling parallelism.
    */
  def asOfNearest(s: SparkSession, dir: String): DataFrame = {
    val sig = when(col("event_type") === "signup", col("ts"))
    val base = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val back = base.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = base.rowsBetween(1, Window.unboundedFollowing)
    Tables.events(s, dir)
      .withColumn("prev_sig", last(sig, ignoreNulls = true).over(back))
      .withColumn("next_sig", first(sig, ignoreNulls = true).over(fwd))
      .withColumn("nearest_signup_ts",
        when(col("prev_sig").isNull, col("next_sig"))
          .when(col("next_sig").isNull, col("prev_sig"))
          .when(unix_micros(col("ts")) - unix_micros(col("prev_sig")) <=
                unix_micros(col("next_sig")) - unix_micros(col("ts")),
            col("prev_sig"))
          .otherwise(col("next_sig")))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("nearest_signup_ts"))
      .orderBy(col("event_id"))
  }

  /** Full outer: per-nation customer counts vs HIGH-BALANCE supplier
    * counts — the filter makes the right side partial, so real one-sided
    * rows appear. Keys coalesced for a total output order.
    */
  def fullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .groupBy(col("c_nationkey").as("c_nk"))
      .agg(count(lit(1)).as("n_cust"))
    val p = Tables.supplier(s, dir)
      .filter(col("s_acctbal") > 6000)
      .groupBy(col("s_nationkey").as("s_nk"))
      .agg(count(lit(1)).as("n_hisupp"))
    c.join(p, col("c_nk") === col("s_nk"), "full_outer")
      .select(coalesce(col("c_nk"), col("s_nk")).as("nkey"),
        col("n_cust"), col("n_hisupp"))
      .orderBy(col("nkey"))
  }

  /** Explicit cartesian product of two tiny dims (25 rows) — the one case
    * where a cross join is the right plan.
    */
  def crossSmall(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).select(col("r_regionkey").as("rk_a"))
      .crossJoin(Tables.region(s, dir).select(col("r_regionkey").as("rk_b")))
      .orderBy(col("rk_a"), col("rk_b"))

  /** LATERAL top-N: each customer's two most expensive orders via a
    * correlated LATERAL subquery with ORDER BY + LIMIT. Runs through
    * `spark.sql` so Catalyst's lateral-join decorrelation actually
    * executes: the per-customer limit rewrites to a ranked window over
    * one shuffle of orders — never a per-row re-scan (nested-loop
    * re-execution is what LATERAL means naively; the decorrelated plan is
    * why it scales). Customers with no orders drop out (inner lateral).
    */
  def lateralTopN(s: SparkSession, dir: String): DataFrame = {
    // dir-scoped view names: the registrations are idempotent per
    // fixture, so two builders racing on one session can never make this
    // query read the OTHER call's tables (temp views are session-global;
    // Tables.dirTag is hex md5 — identifier-safe, collision-resistant)
    val tag = Tables.dirTag(dir)
    Tables.customer(s, dir).createOrReplaceTempView(s"customer_lv_$tag")
    Tables.orders(s, dir).createOrReplaceTempView(s"orders_lv_$tag")
    s.sql(
      s"""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer_lv_$tag c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders_lv_$tag
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin)
  }

  /** Point-in-interval join via BIN BUCKETING — the scalable form of the
    * range join behind IP→geo enrichment, time→campaign attribution, and
    * interval-overlap matching. A naive `ts BETWEEN start AND end` join
    * has no equi-key, so Spark can only BNLJ/cartesian it — quadratic at
    * scale. The bucketed form makes it an EQUI-join: pick a bin width ≥
    * the maximum interval length, replicate each interval to every bin
    * it touches (≤ 2 copies by the width choice), key each point by its
    * single bin, equi-join on the bin, and keep the exact range
    * predicate as a post-join filter. Each (point, interval) match
    * surfaces exactly once — the point's bin is unique, so no dedup pass
    * is needed.
    *
    * The fixture joins the 30-day event log to 60 deterministic
    * 100-minute "campaign windows" (one per 12 h) and reports per-window
    * reach. All boundary math is integer microseconds (`unix_micros` /
    * `div`) — no double quotients whose rounding could move a boundary
    * bin. At 100 TB: the windows side here broadcasts, but the plan
    * stays an equi-join when both sides are huge (shuffle hash on the
    * bin key) — that generality is the point of the technique; the
    * replication factor is bounded by ceil(len/width) + 1 ≤ 2, and bin
    * skew is bounded by the event rate per 100-minute wall-clock slice,
    * not by any enum.
    */
  def intervalBin(s: SparkSession, dir: String): DataFrame = {
    val widthUs = 6000L * 1000000L       // bin = max interval length
    val baseUs = 1704067200L * 1000000L  // 2024-01-01 00:00:00 UTC
    val wins = s.range(60)
      .select(col("id").as("window_id"),
        (lit(baseUs) + col("id") * lit(43200L * 1000000L)).as("w_start_us"))
      .withColumn("w_end_us", col("w_start_us") + lit(widthUs))
      .withColumn("bin", explode(sequence(
        expr(s"w_start_us div $widthUs"),
        expr(s"(w_end_us - 1) div $widthUs"))))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("bin", expr(s"t_us div $widthUs"))
      .join(wins, "bin")
      .filter(col("t_us") >= col("w_start_us") &&
        col("t_us") < col("w_end_us"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("window_id"))
  }

  /** The salted skew join surfaced as a query: lineitem⋈part through
    * [[SkewOps.saltedJoin]] (8 salts — probe rows spread by deterministic
    * hash, build side replicated 8×), aggregated per brand. The oracle is
    * the PLAIN join — result equality IS the salting correctness claim
    * (every probe row meets exactly one replica of each matching build
    * row), checked value-for-value rather than only in SkewOpsSpec.
    * Quantities sum as exact integer cents (order-free).
    *
    * Scale shape: salting trades 8× build-side replication for the hot
    * key's rows spreading over 8 tasks — the explicit mitigation when AQE
    * skew-split can't apply (broadcast-replicable build, known-skewed
    * probe).
    */
  def skewSalted(s: SparkSession, dir: String): DataFrame =
    SkewOps.saltedJoin(
      Tables.lineitem(s, dir).select(col("l_partkey"), col("l_quantity")),
      Tables.part(s, dir).select(col("p_partkey"), col("p_brand")),
      "l_partkey", "p_partkey", 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("qty_cents"))
      .orderBy(col("p_brand"))

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): both sides
    * derive a NULLABLE key (accounts below a balance floor lose their
    * nation), and the join must pair the NULL bucket too — the semantics
    * a plain equi-join silently drops. Catalyst treats EqualNullSafe as a
    * hash-join key, so this stays a shuffled equi-join, never a BNLJ
    * (plan-asserted in Wave9OpsSpec).
    *
    * Scale note: the NULL bucket is ONE key — at 100 TB a fat null
    * population is a skew hazard exactly like any hot key, and the
    * mitigation is the same salting [[skewSalted]] demonstrates (or
    * filtering nulls into a separate union leg). Here both null
    * populations are balance-bounded slices of dimension-sized tables.
    */
  def nullSafe(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select(
      when(col("c_acctbal") < 0, lit(null))
        .otherwise(col("c_nationkey")).as("k"),
      col("c_custkey"))
    val supp = Tables.supplier(s, dir).select(
      when(col("s_acctbal") < 1000, lit(null))
        .otherwise(col("s_nationkey")).as("k2"),
      col("s_suppkey"))
    cust.join(supp, col("k") <=> col("k2"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("c_custkey")).as("n_cust"),
        countDistinct(col("s_suppkey")).as("n_supp"))
      .orderBy(col("k").asc_nulls_first)
  }

  /** Entity-resolution fuzzy join with BLOCKING: near-duplicate part
    * names by edit distance ≤ 3, candidate pairs generated only within a
    * blocking key (first 3 chars), never all-pairs. The match runs on the
    * DEDUPED name vocabulary — the fact table collapses to its ~64
    * distinct names first, each carrying its row count, so the quadratic
    * step is |vocab-block|², not |rows|²: exactly how production ER
    * handles a 100 TB fact table whose entity vocabulary is bounded
    * (names, merchants, SKUs). The blocking key is the standard
    * recall/cost dial: a typo in the first 3 chars escapes this block —
    * real deployments union several cheap blocks (prefix, length,
    * phonetic); one suffices to pin the operator shape.
    *
    * levenshtein is the classic unit-cost edit distance in both engines,
    * so the distance column itself value-oracles.
    */
  def fuzzyName(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(s, dir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("blk", substring(col("p_name"), 1, 3))
    val a = names.select(col("blk"), col("p_name").as("name_a"),
      col("n_parts").as("n_parts_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"),
      col("n_parts").as("n_parts_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) <= 3)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).as("lev"),
        col("n_parts_a"), col("n_parts_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Bloom-prefiltered semi join — the RUNTIME-FILTER pattern behind
    * Spark's own `spark.sql.optimizer.runtime.bloomFilter` and every
    * warehouse's "sideways information passing": the small (build) side's
    * join keys are folded into a bloom filter, and the big (probe) side is
    * pruned by that filter BEFORE its shuffle, so rows that cannot join
    * never pay exchange/serialization cost. Here it's explicit and
    * portable: high-value orders (o_totalprice > 480000, ~1/3 of
    * customers' keys) build a 65536-bit / k=4 bloom via ONE tiny
    * distributed aggregation (1024 bit-or'd words), the 8 KB word array is
    * collected (a bounded model artifact, same stance as the IVF
    * quantizer) and inlined as a literal, and the customer scan is
    * filtered by 4 md5-derived bit probes — all built-in, codegen'd
    * expressions, no UDF. The exact semi join after the filter removes
    * bloom false positives, so the RESULT is identical to the plain semi
    * join (blooms have no false negatives) and the oracle is the plain
    * EXISTS query; the bloom only changes WHERE rows die. At 100 TB the
    * filter cuts the probe-side exchange by the build's true selectivity
    * (~3× here, measured in JoinBloomPrefilterSpec); `mBits` scales with
    * the expected build cardinality (65536 bits ≈ <1% FP at 5k keys,
    * grow linearly — the array stays a broadcast-class literal up to
    * hundreds of MB of keys).
    */
  def bloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    val (build, probePred) = bloomBuildAndPredicate(s, dir)
    Tables.customer(s, dir)
      .filter(expr(probePred))
      .join(build, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))
  }

  /** The build-side keys and the probe-side bloom predicate SQL —
    * factored out so JoinBloomPrefilterSpec can measure the filter's
    * pruning power and no-false-negative guarantee independently of the
    * final join.
    */
  private[graft] def bloomBuildAndPredicate(
      s: SparkSession, dir: String): (DataFrame, String) = {
    val k = 4
    val mBits = 65536L
    val nWords = (mBits / 64).toInt
    val build = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 480000.0)
      .select(col("o_custkey")).distinct()
    val wordRows = build
      .select(col("o_custkey"),
        explode(expr(s"sequence(0, ${k - 1})")).as("i"))
      .withColumn("pos", expr(
        s"CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', " +
          s"CAST(o_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT) % $mBits"))
      .select(expr("pos DIV 64").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
          .as("mask"))
      .groupBy(col("word")).agg(expr("bit_or(mask)").as("bits"))
      .collect()
    val words = Array.fill(nWords)(0L)
    wordRows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    val wordsArr =
      words.map(w => s"${w}L").mkString("array(", ",", ")")
    val probePred = (0 until k).map { i =>
      val pos = s"(CAST(conv(substring(md5(concat('$i', ':', " +
        s"CAST(c_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT) % $mBits)"
      s"((element_at($wordsArr, CAST($pos DIV 64 AS INT) + 1) & " +
        s"shiftleft(CAST(1 AS BIGINT), CAST($pos % 64 AS INT))) <> 0)"
    }.mkString(" AND ")
    (build, probePred)
  }

  /** Bucketed CO-LOCATED join — the shuffle-free fact⋈fact pattern that
    * bucketing exists for: both sides are written as parquet tables
    * bucketed (and sorted) by the join key, so the sort-merge join reads
    * each bucket pair directly and NO exchange appears anywhere in the
    * join+aggregate pipeline (plan-asserted in JoinBucketedSpec: zero
    * `Exchange hashpartitioning` — the bucketed scan satisfies the join's
    * distribution requirement AND the downstream per-order aggregate's,
    * since both key on o_orderkey). At 100 TB this is the difference
    * between shuffling the fact table on every join and shuffling it
    * ONCE at write time: a nightly-bucketed lineitem serves every
    * orderkey join and orderkey rollup for free. The `merge` hint pins
    * SMJ so tiny test SFs can't silently fall back to a broadcast join
    * and vacuously pass the no-exchange audit. Result is value-identical
    * to the plain join (bucketing only changes layout) — the oracle is
    * the direct SQL; quantity sums go through DECIMAL for bit-exact
    * cross-engine agreement.
    */
  /** Per-JVM scratch root for the bucketed tables (the sink_roundtrip
    * pattern): system tmp + process nonce so concurrent JVMs never
    * collide on a table LOCATION (a managed table's warehouse dir
    * outlives the in-memory catalog that knew about it, so a second JVM
    * would refuse the name), recursively removed on JVM exit.
    */
  private lazy val bucketBase: java.io.File = {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-bkt-${java.util.UUID.randomUUID().toString.take(8)}")
    d.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(d)
    }))
    d
  }

  def bucketedColocated(s: SparkSession, dir: String): DataFrame = {
    val nb = 8
    val tagO = s"graft_bkt_orders_${Tables.dirTag(dir)}"
    val tagL = s"graft_bkt_lineitem_${Tables.dirTag(dir)}"
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").format("parquet")
      .option("path", new java.io.File(bucketBase, tagO).getAbsolutePath)
      .bucketBy(nb, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(tagO)
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite").format("parquet")
      .option("path", new java.io.File(bucketBase, tagL).getAbsolutePath)
      .bucketBy(nb, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(tagL)
    s.table(tagL).hint("merge")
      .join(s.table(tagO), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)")
          .as("sum_qty"),
        min(col("o_totalprice")).as("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_bucketed_colocated" -> bucketedColocated,
    "join_bloom_prefilter" -> bloomPrefilter,
    "join_fuzzy_name" -> fuzzyName,
    "join_null_safe" -> nullSafe,
    "join_skew_salted" -> skewSalted,
    "join_interval_bin" -> intervalBin,
    "join_inner_equi" -> innerEqui,
    "join_broadcast" -> broadcastDims,
    "join_left_outer" -> leftOuter,
    "join_full_outer" -> fullOuter,
    "join_cross_small" -> crossSmall,
    "join_semi" -> semi,
    "join_anti" -> anti,
    "join_range_theta" -> rangeTheta,
    "join_asof" -> asOf,
    "join_asof_forward" -> asOfForward,
    "join_asof_nearest" -> asOfNearest,
    "join_lateral_topn" -> lateralTopN
  )

  val oracle: Map[String, String] = Map(
    "join_bucketed_colocated" ->
      """SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2)))
        |                 AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
        |       min(o.o_totalprice) AS o_totalprice
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY o_orderkey""".stripMargin,
    "join_bloom_prefilter" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 480000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_fuzzy_name" ->
      """WITH names AS (
        |  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
        |         substr(p_name, 1, 3) AS blk
        |  FROM part GROUP BY 1)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev,
        |       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
        |FROM names a JOIN names b ON a.blk = b.blk
        |WHERE a.p_name < b.p_name
        |  AND levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin,
    "join_null_safe" ->
      """WITH c AS (
        |  SELECT CASE WHEN c_acctbal < 0 THEN NULL
        |              ELSE c_nationkey END AS k, c_custkey
        |  FROM customer),
        |s AS (
        |  SELECT CASE WHEN s_acctbal < 1000 THEN NULL
        |              ELSE s_nationkey END AS k, s_suppkey
        |  FROM supplier)
        |SELECT c.k, CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_cust,
        |       CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_supp
        |FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
        |GROUP BY 1 ORDER BY c.k NULLS FIRST""".stripMargin,
    "join_skew_salted" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |         AS qty_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY p_brand""".stripMargin,
    "join_interval_bin" ->
      """WITH w AS (
        |  SELECT CAST(k AS BIGINT) AS window_id,
        |         1704067200000000 + k * 43200000000 AS w_start_us
        |  FROM (SELECT unnest(range(60)) AS k)),
        |e AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
        |  FROM events)
        |SELECT window_id, count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users
        |FROM e JOIN w
        |  ON t_us >= w_start_us AND t_us < w_start_us + 6000000000
        |GROUP BY window_id ORDER BY window_id""".stripMargin,
    "join_inner_equi" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_custkey, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """SELECT coalesce(c.c_nk, p.s_nk) AS nkey, c.n_cust, p.n_hisupp
        |FROM (SELECT c_nationkey AS c_nk, count(*) AS n_cust
        |      FROM customer GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey AS s_nk, count(*) AS n_hisupp
        |           FROM supplier WHERE s_acctbal > 6000
        |           GROUP BY s_nationkey) p
        |  ON c.c_nk = p.s_nk
        |ORDER BY nkey""".stripMargin,
    "join_cross_small" ->
      """SELECT a.r_regionkey AS rk_a, b.r_regionkey AS rk_b
        |FROM region a CROSS JOIN region b
        |ORDER BY rk_a, rk_b""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "join_range_theta" ->
      """SELECT a.event_type AS type_a, b.event_type AS type_b,
        |       count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "join_lateral_topn" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) t ON true
        |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin,
    "join_asof" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |       last_value(CASE WHEN event_type = 'signup'
        |                       THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
        |         OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |         AS prev_signup_ts
        |FROM events ORDER BY event_id""".stripMargin,
    "join_asof_forward" ->
      """WITH b AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |         first_value(CASE WHEN event_type = 'signup'
        |                          THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |           AS next_sig
        |  FROM events)
        |SELECT event_id, user_id, ts,
        |       CASE WHEN date_diff('microsecond', ts, next_sig)
        |                 <= 86400000000 THEN next_sig END
        |         AS next_signup_ts
        |FROM b ORDER BY event_id""".stripMargin,
    "join_asof_nearest" ->
      """WITH b AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |         last_value(CASE WHEN event_type = 'signup'
        |                         THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
        |           OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS prev_sig,
        |         first_value(CASE WHEN event_type = 'signup'
        |                          THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
        |           OVER (w ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |           AS next_sig
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, ts,
        |       CASE WHEN prev_sig IS NULL THEN next_sig
        |            WHEN next_sig IS NULL THEN prev_sig
        |            WHEN date_diff('microsecond', prev_sig, ts)
        |                 <= date_diff('microsecond', ts, next_sig)
        |            THEN prev_sig ELSE next_sig END AS nearest_signup_ts
        |FROM b ORDER BY event_id""".stripMargin
  )
}
