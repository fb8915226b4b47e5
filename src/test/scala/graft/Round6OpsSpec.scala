package graft

import org.apache.spark.sql.functions._

import graft.operators.{DataQualityOps, EventOps, TextOps}

/** Semantic + plan tests for the round-6 third-wave additions
  * (dq_histogram, dim_scd2, llm_vocab_census) and the runtime
  * bloom-filter join-pruning audit. The DuckDB value oracles are the
  * correctness gate; these tests pin the invariants the oracles can't
  * see — conservation, monotonicity, interval chaining, and the
  * physical-plan properties the 100 TB story depends on.
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("dq_histogram: buckets are conservative (counts sum to the table), " +
    "edges respected, shares sum to 1") {
    val h = DataQualityOps.histogram(spark, sf0001).collect()
    val total = Tables.lineitem(spark, sf0001).count()
    assert(h.map(_.getAs[Long]("n")).sum == total)
    assert(math.abs(h.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    h.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val lo = r.getAs[Double]("lo")
      val hi = r.getAs[Double]("hi")
      assert(b >= 0 && b <= 19)
      assert(lo <= hi)
      assert(lo >= b * 5000.0)
      if (b < 19) assert(hi < (b + 1) * 5000.0) // 19 is top-coded
    }
  }

  test("dim_scd2: versions contiguous, exactly one open row per user, " +
    "intervals chain and never repeat a state") {
    val d = EventOps.scd2(spark, sf0001)
    // exactly one is_current (valid_to IS NULL) per user
    val open = d.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("n_open"))
      .filter(col("n_open") =!= 1L).count()
    assert(open == 0L)
    // versions are 1..n per user with no gaps; intervals chain exactly;
    // consecutive versions never carry the same state (else they'd have
    // been collapsed into one validity interval)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val bad = d
      .withColumn("prev_version", lag(col("version"), 1).over(w))
      .withColumn("prev_to", lag(col("valid_to"), 1).over(w))
      .withColumn("prev_state", lag(col("state"), 1).over(w))
      .filter(
        (col("prev_version").isNull && col("version") =!= 1L) ||
        (col("prev_version").isNotNull &&
          (col("version") =!= col("prev_version") + 1L ||
           col("prev_to") =!= col("valid_from") ||
           col("prev_state") === col("state"))))
      .count()
    assert(bad == 0L)
    // closed rows end after they start
    assert(d.filter(col("valid_to").isNotNull &&
      col("valid_to") <= col("valid_from")).count() == 0L)
  }

  test("dim_scd2 plan: one exchange serves both window passes — the lag " +
    "filter and the intervalizer share the user_id sort") {
    val plan = finalPlan(EventOps.scd2(spark, sf0001))
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("llm_vocab_census: 100 rows, counts non-increasing, cum_share " +
    "strictly increasing and bounded by 1") {
    val rows = TextOps.vocabCensus(spark, sf0001).collect()
    // the fixture vocabulary is tiny (31 types at sf0.001) — the census
    // returns min(vocab, 100) rows and the full coverage curve
    val vocab = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0).distinct().count()
    assert(rows.length.toLong == math.min(vocab, 100L))
    assert(rows.map(_.getAs[Long]("rank")).toSeq ==
      (1L to rows.length.toLong))
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a < b })
    assert(shares.last <= 1.0 + 1e-9 && shares.head > 0.0)
    // the full (≤100-type) vocabulary covers the entire stream
    if (vocab <= 100) assert(math.abs(shares.last - 1.0) < 1e-9)
  }

  test("llm_vocab_census plan: top-100 is a bounded heap " +
    "(TakeOrderedAndProject), never a global sort of the vocabulary") {
    val plan = finalPlan(TextOps.vocabCensus(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("dq_outliers: conserves row counts and only reports outliers when " +
    "the max |z| actually crosses the 3-sigma gate") {
    val o = DataQualityOps.outliers(spark, sf0001).collect()
    val total = Tables.events(spark, sf0001).count()
    assert(o.map(_.getAs[Long]("n")).sum == total)
    o.foreach { r =>
      val nOut = r.getAs[Long]("n_outliers")
      val maxZ = r.getAs[Double]("max_abs_z")
      assert(nOut >= 0 && nOut < r.getAs[Long]("n"))
      assert((nOut > 0) == (maxZ > 3.0))
    }
  }

  test("join_asof_nearest: picks the closer signup, ties to the earlier, " +
    "one-sided rows fall back to the existing side") {
    val near = graft.operators.JoinOps.asOfNearest(spark, sf0001)
    val ev = Tables.events(spark, sf0001)
    // every matched ts is a real signup ts of the same user
    val sigs = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("nearest_signup_ts"))
    assert(near.filter(col("nearest_signup_ts").isNotNull)
      .join(sigs, Seq("user_id", "nearest_signup_ts"), "left_anti")
      .count() == 0L)
    // nearest dominates the backward-only answer: |ts - nearest| <=
    // |ts - prev| wherever the backward as-of found anything
    val back = graft.operators.JoinOps.asOf(spark, sf0001)
      .select(col("event_id"), col("prev_signup_ts"))
    val worse = near.join(back, "event_id")
      .filter(col("prev_signup_ts").isNotNull)
      .filter(abs(unix_micros(col("ts")) -
          unix_micros(col("nearest_signup_ts"))) >
        abs(unix_micros(col("ts")) - unix_micros(col("prev_signup_ts"))))
      .count()
    assert(worse == 0L)
  }

  test("join_asof_nearest plan: the backward and forward passes share one " +
    "exchange and one sort — never a range self-join") {
    val plan = finalPlan(graft.operators.JoinOps.asOfNearest(spark, sf0001))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Cartesian"),
      plan)
  }

  test("runtime bloom-filter join pruning: a selective dim filter injects " +
    "a bloom probe into the fact scan side (the runtime semi-join " +
    "reduction large shuffle joins rely on at scale)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter" +
        ".applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf0001)
      val sel = Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
      val plan = finalPlan(joined)
      assert(plan.contains("might_contain"),
        s"no bloom-filter probe injected, plan:\n$plan")
    } finally {
      saved.foreach { case (k, v) =>
        v.fold(conf.unset(k))(conf.set(k, _))
      }
    }
  }
}
