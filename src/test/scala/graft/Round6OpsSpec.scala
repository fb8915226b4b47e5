package graft

import org.apache.spark.sql.functions._

import graft.operators.{AggOps, DataQualityOps, EventOps, RelationalOps, TextOps}

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

  test("event_sessionize: sessions partition the events, intra-session " +
    "gaps <= 30min, inter-session gaps > 30min") {
    val sess = EventOps.sessionize(spark, sf0001)
    val total = Tables.events(spark, sf0001).count()
    assert(sess.agg(sum(col("n_events"))).head().getLong(0) == total)
    // consecutive sessions of one user are separated by > 30 minutes,
    // and numbered contiguously from 1
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_id")
    val bad = sess
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .withColumn("prev_sid", lag(col("session_id"), 1).over(w))
      .filter(
        (col("prev_sid").isNull && col("session_id") =!= 1L) ||
        (col("prev_sid").isNotNull &&
          (col("session_id") =!= col("prev_sid") + 1L ||
           unix_micros(col("session_start")) -
             unix_micros(col("prev_end")) <= 1800L * 1000000L)))
      .count()
    assert(bad == 0L)
    // a session's span can exceed 30min only via chained events; spot-pin
    // the invariant that duration is non-negative and start <= end
    assert(sess.filter(col("duration_us") < 0).count() == 0L)
  }

  test("cdc_snapshot_diff: one row per user, insert iff no pre-boundary " +
    "events, unchanged iff nothing arrived after") {
    val d = EventOps.cdcDiff(spark, sf0001)
    val ev = Tables.events(spark, sf0001)
    val users = ev.select("user_id").distinct().count()
    assert(d.count() == users)
    assert(d.select("user_id").distinct().count() == users)
    // session-TZ (UTC) boundary, same literal the operator casts — a JVM
    // java.sql.Timestamp.valueOf here would shift on non-UTC machines
    val boundary = lit("2024-01-15").cast("timestamp")
    val preUsers = ev.filter(col("ts") < boundary)
      .select("user_id").distinct().count()
    assert(d.filter(col("status") === "insert").count() == users - preUsers)
    // unchanged <=> the user's last event overall is before the boundary
    val lastTs = ev.groupBy("user_id").agg(max("ts").as("last_ts"))
    val expectUnchanged = lastTs.filter(col("last_ts") < boundary).count()
    assert(d.filter(col("status") === "unchanged").count() == expectUnchanged)
    assert(d.filter(col("status") === "delete").count() == 0L)
  }

  test("agg_mode: the mode's count is the max per-group count and ties " +
    "break to the smallest value") {
    val m = AggOps.modeAgg(spark, sf0001).collect()
    val counts = Tables.orders(spark, sf0001)
      .groupBy("o_orderstatus", "o_orderpriority").count().collect()
      .groupBy(_.getString(0))
    m.foreach { r =>
      val grp = counts(r.getString(0)).map(x => (x.getString(1), x.getLong(2)))
      val maxN = grp.map(_._2).max
      assert(r.getLong(2) == maxN)
      val want = grp.filter(_._2 == maxN).map(_._1).min
      assert(r.getString(1) == want)
    }
  }

  test("agg_collect_ordered: per-nation list is the acctbal-descending " +
    "top-3 custkeys in rank order") {
    val got = AggOps.collectOrdered(spark, sf0001).collect()
    got.foreach { r =>
      val keys = r.getString(1).split(",")
      assert(keys.length == r.getLong(2) && keys.length <= 3)
    }
    // re-derive one nation's expected list independently
    val nk = got.head.get(0)
    val want = Tables.customer(spark, sf0001)
      .filter(col("c_nationkey") === nk)
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(3).select("c_custkey").collect().map(_.getLong(0))
      .mkString(",")
    assert(got.head.getString(1) == want)
  }

  test("layout_zorder: cells bound BOTH dimension spans to 16 — the " +
    "file-skipping guarantee of the curve layout") {
    val z = RelationalOps.zorderLayout(spark, sf0001).collect()
    assert(z.length <= 256)
    val total = Tables.orders(spark, sf0001).count()
    assert(z.map(_.getAs[Long]("n")).sum == total)
    z.foreach { r =>
      // a top-level cell fixes the high 4 bits of each dimension, so
      // every file written from one cell spans <= 16 of x AND <= 16 of y
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 15L)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 15L)
      assert(r.getAs[Long]("z_cell") >= 0L && r.getAs[Long]("z_cell") <= 255L)
    }
  }

  test("agg_weighted_percentile: quantiles ordered, equal to the textbook " +
    "window form, and the running weight is spread — not a 3-key window") {
    val got = AggOps.weightedPercentile(spark, sf0001)
    val rows = got.collect()
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) &&
        r.getDouble(2) <= r.getDouble(3))
    }
    // independent window-form recompute
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("l_extendedprice")
    val grouped = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_extendedprice"),
        expr("CAST(l_quantity AS DECIMAL(18,2))").as("q"))
      .groupBy("l_returnflag", "l_extendedprice").agg(sum("q").as("wt"))
    val want = grouped
      .withColumn("cum", sum("wt").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .withColumn("tw", sum("wt").over(
        org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag")))
      .groupBy(col("l_returnflag"), col("tw"))
      .agg(min(when(col("cum") * 2 >= col("tw"), col("l_extendedprice")))
        .as("wp50"))
      .select(col("l_returnflag"), col("wp50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(r.getDouble(2) == want(r.getString(0))))
    // plan: the per-price running weight must ride the spread (__pid)
    // pass, never a window partitioned by the bare 3-value flag
    val plan = finalPlan(got)
    assert(plan.contains("windowspecdefinition(__pid"), plan)
  }

  test("agg_heavy_hitters: exact — equals the direct count-and-filter, " +
    "and the MG sketch never loses a true heavy hitter") {
    val hh = AggOps.heavyHitters(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = Tables.events(spark, sf0001).count()
    val want = Tables.events(spark, sf0001)
      .groupBy("user_id").count()
      .filter(col("count") * 1300 > total)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hh == want)
    // aggregator-level superset guarantee on an adversarial skewed stream
    // (order chosen so decrements hit the heavy key as often as possible)
    val mg = graft.functions.HeavyHitters.MisraGriesAgg(4)
    val stream = (1L to 200L).flatMap(i => Seq(0L, i)) // 0 has freq n/2
    var buf = mg.zero
    stream.foreach(x => buf = mg.reduce(buf, x))
    assert(buf.counts.contains(0L))
    // merge keeps the bound: two disjoint skewed summaries trim to k
    val bufB = (1000L to 1200L).flatMap(i => Seq(7L, i))
      .foldLeft(mg.zero)(mg.reduce)
    val merged = mg.merge(buf, bufB)
    assert(merged.counts.size <= 4)
    assert(merged.counts.contains(0L) && merged.counts.contains(7L))
  }

  test("subquery_exists: EXISTS plans a semi join and NOT EXISTS an anti " +
    "join — never a per-row re-execution") {
    val df = graft.operators.SubqueryOps.existsSubquery(spark, sf0001)
    val plan = finalPlan(df)
    assert(plan.contains("LeftSemi"), s"no semi join in plan:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join in plan:\n$plan")
    // semantics: every returned customer has >=1 'F' order and zero 'O'
    val ord = Tables.orders(spark, sf0001)
    val f = ord.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey")).distinct()
    val o = ord.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey")).distinct()
    val expected = f.join(o, f("o_custkey") === o("o_custkey"), "left_anti")
      .count()
    assert(df.count() == expected)
  }

  test("dq_referential: the shipped fixture is referentially clean, " +
    "totals match table counts") {
    val r = DataQualityOps.referential(spark, sf0001).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("lineitem_to_orders")._1 ==
      Tables.lineitem(spark, sf0001).count())
    assert(r("orders_to_customer")._1 == Tables.orders(spark, sf0001).count())
    assert(r("customer_to_nation")._1 ==
      Tables.customer(spark, sf0001).count())
    // FK edges hold on the generated star schema; childless orders may
    // legitimately exist, but violations never exceed totals
    assert(r("lineitem_to_orders")._2 == 0L)
    assert(r("orders_to_customer")._2 == 0L)
    assert(r("customer_to_nation")._2 == 0L)
    r.values.foreach { case (total, bad) => assert(bad <= total) }
  }

  test("fn_url: parse_url splits agree with independent re-derivation") {
    val rows = graft.operators.ScalarFnOps.fnUrl(spark, sf0001)
      .limit(20).collect()
    rows.foreach { r =>
      val url = r.getAs[String]("url")
      assert(url.startsWith("https://"))
      assert(r.getAs[String]("host") == url.stripPrefix("https://")
        .takeWhile(_ != '/'))
      assert(r.getAs[String]("path") == "/u/" + url.split("/u/")(1)
        .takeWhile(_ != '?'))
      assert(r.getAs[String]("query") == url.dropWhile(_ != '?').drop(1))
      assert(r.getAs[String]("ref") ==
        url.split("ref=")(1).takeWhile(_ != '&'))
    }
  }

  test("event_sessionize plan: the gap window, session counter, and " +
    "per-session rollup share ONE hash exchange") {
    val plan = finalPlan(EventOps.sessionize(spark, sf0001))
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("dq_referential plan: the tiny dimension edge broadcasts; top-k " +
    "census plans stay bounded-heap") {
    val plan = finalPlan(DataQualityOps.referential(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"nation-edge check should broadcast, plan:\n$plan")
    val top = finalPlan(TextOps.bpePairs(spark, sf0001))
    assert(top.contains("TakeOrderedAndProject"),
      s"top-50 must be a bounded heap, plan:\n$top")
  }

  test("llm_bigram_lm: probabilities in (0,1], and each row's n_a equals " +
    "an independent leading-token recount") {
    val rows = TextOps.bigramLm(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      val p = r.getAs[Double]("p")
      assert(p > 0.0 && p <= 1.0)
      assert(r.getAs[Long]("n_ab") <= r.getAs[Long]("n_a"))
    }
    // recount n_a for the top row's leading token: occurrences of `a` as
    // a non-final token across the corpus
    val a = rows.head.getAs[String]("a")
    val want = Tables.documents(spark, sf0001)
      .select(explode(expr("slice(split(text, ' '), 1, " +
        "size(split(text, ' ')) - 1)")).as("tok"))
      .filter(col("tok") === a).count()
    assert(rows.head.getAs[Long]("n_a") == want)
  }

  test("event_funnel_windowed: conversions bounded by signups, cohorts " +
    "cover every signup user exactly once") {
    val f = EventOps.funnelWindowed(spark, sf0001).collect()
    f.foreach { r =>
      val n = r.getAs[Long]("n_signups")
      val c = r.getAs[Long]("n_converted_7d")
      assert(c >= 0 && c <= n)
      assert(math.abs(r.getAs[Double]("cvr_7d") - c.toDouble / n) < 1e-12)
    }
    val signupUsers = Tables.events(spark, sf0001)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(f.map(_.getAs[Long]("n_signups")).sum == signupUsers)
  }

  test("llm_cluster_keep_best: the quality pick dominates the min-id " +
    "pick and stays inside its own cluster") {
    val clusters = graft.operators.DedupOps.dupClusters(spark, sf0001)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = TextOps.qualityScore(spark, sf0001)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val best = graft.operators.DedupOps.clusterKeepBest(spark, sf0001)
      .collect()
    assert(best.nonEmpty)
    best.foreach { r =>
      val (cid, bd, bq, mid) = (r.getLong(0), r.getLong(2),
        r.getDouble(3), r.getLong(4))
      assert(clusters(bd) == cid, "best doc must belong to its cluster")
      assert(bq == quality(bd))
      assert(bq >= quality(mid), "quality pick must dominate min-id pick")
      assert(r.getBoolean(5) == (bd == mid))
    }
  }

  test("llm_train_eval_split: cluster-mates never straddle splits, every " +
    "doc assigned exactly once") {
    val split = graft.operators.DedupOps.trainEvalSplit(spark, sf0001)
    val total = Tables.documents(spark, sf0001).count()
    assert(split.count() == total)
    assert(split.select("doc_id").distinct().count() == total)
    // leakage guard: one split per unit (= per dup cluster)
    val straddling = split.groupBy("unit_id")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
    assert(straddling == 0L)
    // all three splits exist and train dominates
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") + bySplit("test"))
  }

  test("keep-best and train-split FromStore twins: persisted label " +
    "artifacts round-trip to the exact inline results") {
    val dir = java.nio.file.Files.createTempDirectory("graft_labels").toString
    graft.operators.DedupOps.dupClusters(spark, sf0001)
      .write.mode("overwrite").parquet(s"$dir/labels.parquet")
    val stored = spark.read.parquet(s"$dir/labels.parquet")
    val bestInline = graft.operators.DedupOps
      .clusterKeepBest(spark, sf0001).collect().toSeq
    val bestStored = graft.operators.DedupOps
      .clusterKeepBestFromStore(spark, stored, sf0001).collect().toSeq
    assert(bestInline == bestStored)
    val splitInline = graft.operators.DedupOps
      .trainEvalSplit(spark, sf0001).collect().toSeq
    val splitStored = graft.operators.DedupOps
      .trainEvalSplitFromStore(spark, stored, sf0001).collect().toSeq
    assert(splitInline == splitStored)
  }

  test("ingest_dlq_split: parser-derived dispositions equal the " +
    "arithmetic corruption plan") {
    val got = graft.operators.IngestOps.dlqSplit(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sf0001)
    val trunc = ev.filter(col("event_id") % 97 === 0).count()
    val bad = ev.filter(col("event_id") % 101 === 0 &&
      col("event_id") % 97 =!= 0).count()
    val total = ev.count()
    assert(got.getOrElse("dead_letter_truncated", 0L) == trunc)
    assert(got.getOrElse("dead_letter_badtype", 0L) == bad)
    assert(got.getOrElse("ok", 0L) == total - trunc - bad)
  }

  test("llm_bpe_pairs: top-50 descending, and pair volume conserves " +
    "(full census sums to sum(len(toks) - 1))") {
    val top = TextOps.bpePairs(spark, sf0001).collect()
    assert(top.length <= 50)
    val ns = top.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (x, y) => x >= y })
    // conservation over the unlimited census
    val docs = Tables.documents(spark, sf0001)
    val expected = docs
      .select((size(split(col("text"), " ")) - 1).cast("long").as("k"))
      .agg(sum(when(col("k") > 0, col("k")).otherwise(0L))).head().getLong(0)
    val full = docs
      .select(explode(arrays_zip(
        slice(split(col("text"), " "), lit(1),
          size(split(col("text"), " ")) - 1).as("a"),
        slice(split(col("text"), " "), lit(2),
          size(split(col("text"), " ")) - 1).as("b"))).as("pr"))
      .count()
    assert(full == expected)
  }
}
