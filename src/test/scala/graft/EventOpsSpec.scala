package graft

import org.apache.spark.sql.functions._

import graft.operators.{AggOps, EventOps, JoinOps, SimOps}

/** Semantic + plan tests for the event-sequence analytics (EventOps) and
  * the round's other additions (agg_argmax, join_lateral_topn,
  * llm_semantic_dedup). The DuckDB value oracles are the correctness
  * gate; these tests pin the invariants the oracles can't see — pick
  * determinism preconditions, cross-column consistency, and the physical
  * plans the 100 TB story depends on.
  */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  test("(user_id, ts) is tie-free — the max_by/arg_max determinism " +
    "precondition every EventOps pick relies on") {
    val dups = Tables.events(spark, sf0001)
      .groupBy("user_id", "ts").count().filter(col("count") > 1).count()
    assert(dups == 0L)
  }

  test("event_funnel: stages are consistent with their timestamps") {
    val rows = EventOps.funnel(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getAs[Int]("stage")
      val tSignup = r.getAs[java.sql.Timestamp]("t_signup")
      val tView = Option(r.getAs[java.sql.Timestamp]("t_view"))
      val tPurchase = Option(r.getAs[java.sql.Timestamp]("t_purchase"))
      assert(tSignup != null)
      assert(stage == 1 + tView.size + tPurchase.size)
      // a deeper stage's timestamp is strictly later than the previous
      tView.foreach(v => assert(v.after(tSignup)))
      (tView, tPurchase) match {
        case (Some(v), Some(p)) => assert(p.after(v))
        case (None, Some(_)) => fail("purchase stage without view stage")
        case _ =>
      }
    }
    // every user with any signup event appears exactly once
    val signups = Tables.events(spark, sf0001)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(rows.length.toLong == signups)
  }

  test("event_attribution: the credited touch precedes its purchase and " +
    "matches a real event of that user") {
    val attr = EventOps.attribution(spark, sf0001)
    val bad = attr.filter(col("touch_ts").isNotNull &&
      col("touch_ts") >= col("purchase_ts")).count()
    assert(bad == 0L)
    val types = attr.filter(col("touch_type").isNotNull)
      .select("touch_type").distinct().as[String].collect().toSet
    assert(types.subsetOf(Set("click", "view")))
    // each attributed (user, touch_ts, touch_type) is an actual event
    val ghosts = attr.filter(col("touch_ts").isNotNull)
      .select(col("user_id"), col("touch_ts").as("ts"),
        col("touch_type").as("event_type"))
      .distinct()
      .join(Tables.events(spark, sf0001)
        .select("user_id", "ts", "event_type"),
        Seq("user_id", "ts", "event_type"), "left_anti")
      .count()
    assert(ghosts == 0L)
  }

  test("ts_gapfill_locf: hourly grid is contiguous per user and the fill " +
    "is never null") {
    val out = EventOps.gapfillLocf(spark, sf0001)
    assert(out.filter(col("value_locf").isNull).count() == 0L)
    // contiguous: per user, (max-min hours + 1) == row count, rows distinct
    val spans = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        ((unix_timestamp(max("hr")) - unix_timestamp(min("hr"))) / 3600 + 1)
          .cast("long").as("span"))
      .filter(col("n") =!= col("span")).count()
    assert(spans == 0L)
    // an hour WITH an observation reports that observation (LOCF only
    // fills the holes): spot-check via an independent recompute
    val ev = Tables.events(spark, sf0001)
      .filter(col("ts") < lit("2024-01-08").cast("timestamp"))
    val direct = ev.groupBy(col("user_id"),
        date_trunc("hour", col("ts")).as("hr"))
      .agg(max_by(col("value"), col("ts")).as("expect"))
    val mismatches = out.join(direct, Seq("user_id", "hr"))
      .filter(col("value_locf") =!= col("expect")).count()
    assert(mismatches == 0L)
  }

  test("agg_argmax: picked customers actually carry their group's extrema") {
    val out = AggOps.argExtrema(spark, sf0001)
    val cust = Tables.customer(spark, sf0001)
      .join(Tables.nation(spark, sf0001),
        col("c_nationkey") === col("n_nationkey"))
    val top = out.select(col("n_name"), col("top_customer").as("c_name"),
      col("max_acctbal"))
    val bad = top.join(cust.select("n_name", "c_name", "c_acctbal"),
        Seq("n_name", "c_name"))
      .filter(col("c_acctbal") =!= col("max_acctbal")).count()
    assert(bad == 0L)
  }

  test("join_lateral_topn: per-customer top-2, equal to the window form") {
    val lateral = JoinOps.lateralTopN(spark, sf0001)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = Tables.orders(spark, sf0001)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"),
        col("o_totalprice"))
    assert(lateral.count() == windowed.count())
    assert(lateral.exceptAll(windowed).count() == 0L)
  }

  test("llm_semantic_dedup: survivors dominate their dropped cell-mates") {
    val survivors = SimOps.semanticDedup(spark, sf0001)
    val n = Tables.embeddings(spark, sf0001).count()
    val kept = survivors.count()
    assert(kept > 0 && kept < n, s"kept $kept of $n — threshold inert?")
    // no surviving pair within one cell may reach the threshold where the
    // LOWER id should have eliminated the higher one... unless the lower
    // one was itself dominated by an even lower id. The hard invariant:
    // the MINIMUM vec_id of every cell always survives.
    val minPerCell = SimOps.semanticDedup(spark, sf0001, threshold = 2.0)
    val firstIds = minPerCell.groupBy("cell").agg(min("vec_id").as("vec_id"))
    val missing = firstIds.join(survivors, Seq("cell", "vec_id"),
      "left_anti").count()
    assert(missing == 0L)
  }

  test("event_retention: offset-0 is always 100%, later offsets never " +
    "exceed the cohort") {
    val ret = EventOps.retention(spark, sf0001)
    val zero = ret.filter(col("week_offset") === 0)
    assert(zero.count() > 0)
    assert(zero.filter(col("retention_pct") =!= 1.0).count() == 0L,
      "signup week must count the whole cohort as active")
    assert(ret.filter(col("n_active") > col("cohort_size")).count() == 0L)
    // week bucketing lands on Mondays (date_trunc('week') contract both
    // engines share)
    val nonMonday = ret.select(dayofweek(col("cohort_week")).as("d"))
      .filter(col("d") =!= 2).count()
    assert(nonMonday == 0L)
  }

  test("ts_ohlc_bars: bar invariants hold and ticks are conserved") {
    val bars = EventOps.ohlcBars(spark, sf0001)
    assert(bars.filter(col("high") < col("low")).count() == 0L)
    assert(bars.filter(col("open") > col("high") ||
      col("open") < col("low") || col("close") > col("high") ||
      col("close") < col("low")).count() == 0L)
    val total = bars.agg(sum("n_ticks")).head().getLong(0)
    assert(total == Tables.events(spark, sf0001).count())
  }

  test("event_path_trigrams: trigram counts conserve the window structure") {
    val tri = EventOps.pathTrigrams(spark, sf0001)
    val rows = tri.collect()
    assert(rows.nonEmpty)
    // per user with n>=3 events, exactly n-2 overlapping trigrams exist
    val expected = Tables.events(spark, sf0001)
      .groupBy("user_id").count()
      .filter(col("count") >= 3)
      .agg(sum(col("count") - 2)).head().getLong(0)
    val total = tri.agg(sum("n")).head().getLong(0)
    assert(total == expected)
    // n_users never exceeds n, steps come from the event-type enum
    assert(rows.forall(r => r.getAs[Long]("n_users") <= r.getAs[Long]("n")))
    val types = Set("click", "error", "purchase", "signup", "view")
    assert(rows.forall(r => types(r.getAs[String]("step1")) &&
      types(r.getAs[String]("step2")) && types(r.getAs[String]("step3"))))
  }

  test("llm_semantic_dedup_incremental: keeps at least what the full " +
    "dedup keeps, batch slice only") {
    val boundary = Tables.snapshotBoundary(spark, sf0001, "embeddings")
    val inc = SimOps.semanticDedupIncremental(spark, sf0001)
      .select("vec_id").as[Long].collect().toSet
    assert(inc.nonEmpty && inc.forall(_ >= boundary))
    // full dedup judges new vectors against ALL lower ids (dropped ones
    // included), incremental only against store survivors — so the full
    // run's batch survivors are a subset of the incremental run's
    val full = SimOps.semanticDedup(spark, sf0001)
      .filter(col("vec_id") >= boundary)
      .select("vec_id").as[Long].collect().toSet
    assert(full.subsetOf(inc))
  }

  test("plans: funnel joins stay equi (no cartesian), lateral decorrelates," +
    " semantic dedup is cell-keyed, gapfill shuffles once") {
    Seq(EventOps.funnel(spark, sf0001),
        JoinOps.lateralTopN(spark, sf0001),
        SimOps.semanticDedup(spark, sf0001),
        SimOps.semanticDedupIncremental(spark, sf0001),
        EventOps.retention(spark, sf0001),
        EventOps.pathTrigrams(spark, sf0001),
        EventOps.attribution(spark, sf0001)).foreach { df =>
      val p = finalPlan(df)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    }
    // gapfill: ONE hash exchange (the up-front user_id repartition) — the
    // rollup and the lead-window both reuse it — and no join at all (the
    // forward-expansion shape carries the fill through the generate)
    val gp = finalPlan(EventOps.gapfillLocf(spark, sf0001))
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(gp).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, plan:\n$gp")
    assert(!gp.contains("Join"), s"gapfill must be join-free:\n$gp")
    // agg_argmax: one aggregate pair over a broadcast dim join, no window
    val ap = finalPlan(AggOps.argExtrema(spark, sf0001))
    assert(ap.contains("BroadcastHashJoin"), ap)
    assert(!ap.contains("Window"), ap)
  }

  test("segmented attribution == plain window attribution row for row, " +
    "and its big windows partition on (user, segment), not bare user") {
    def rows(df: org.apache.spark.sql.DataFrame): Array[String] =
      df.collect().map(_.toSeq.mkString("|"))
    val plain = rows(EventOps.attribution(spark, sf0001))
    val seg = rows(EventOps.attributionSegmented(spark, sf0001))
    assert(plain.nonEmpty)
    assert(seg.length === plain.length)
    assert(seg.sameElements(plain))
    // the event-volume window must key on (user_id, seg) — the bare
    // user_id partitioning appears only over the per-user DAY GRID
    // (≤ days rows per user), so the hot user's stream never sorts in
    // one task
    val p = finalPlan(EventOps.attributionSegmented(spark, sf0001))
    assert(p.contains("seg"), p)
  }

  test("attributionAuto: hot-key probe crosses the dispatch bar on a " +
    "skewed key column, stays under it on uniform keys, and the " +
    "default query is value-identical to the plain form") {
    import org.apache.spark.sql.functions._
    // one key owning 500k rows → estimated hot stream ≈ 500k > 250k bar
    val skewed = spark.range(500000).select(lit(7L).as("user_id"))
    assert(EventOps.estimatedHotKeyRows(skewed) > EventOps.hotKeyTaskRows)
    // 100k distinct keys, one row each → estimate ≈ 100 ≪ bar
    val uniform = spark.range(100000).select(col("id").as("user_id"))
    assert(EventOps.estimatedHotKeyRows(uniform) < EventOps.hotKeyTaskRows)
    // dispatch can never change values: both branches share the oracle
    val auto = EventOps.attributionAuto(spark, sf0001).collect()
      .map(_.toSeq.mkString("|")).toSeq
    val plain = EventOps.attribution(spark, sf0001).collect()
      .map(_.toSeq.mkString("|")).toSeq
    assert(auto === plain)
  }

  test("segmented attribution handles touches and purchases straddling " +
    "segment boundaries (carried prefix, empty-touch days)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val day = 86400L * 1000000L
    // user 1: touch on day 0, nothing day 1, purchases day 2 (carry
    // across an EMPTY day); purchase before any touch on day 0 (null);
    // user 2: touch and purchase same day (within-segment hit), then a
    // day-3 touch AFTER the last purchase (must not leak backwards)
    val us = Seq(
      (1L, 1L, "purchase", 10L), (1L, 2L, "click", 20L),
      (1L, 3L, "purchase", 2 * day + 5L),
      (2L, 4L, "view", 30L), (2L, 5L, "purchase", 40L),
      (2L, 6L, "click", 3 * day + 1L))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_segattr").toString
    // ts ships as raw int64 NANOS — the StressGen shape Tables.events
    // verifies via footer stats before its div-1000 read
    us.toDF("user_id", "event_id", "event_type", "us")
      .withColumn("ts", (col("us") + lit(1704067200000000L)) * 1000L)
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.mkString("|")).toSeq
    val plain = rows(EventOps.attribution(spark, dir))
    val seg = rows(EventOps.attributionSegmented(spark, dir))
    assert(plain.size === 3) // three purchases
    assert(seg === plain)
    // and the day-2 purchase really carried the day-0 click
    val carriedRow = EventOps.attributionSegmented(spark, dir)
      .filter(col("event_id") === 3L).collect().head
    assert(carriedRow.getAs[String]("touch_type") === "click")
  }
}
