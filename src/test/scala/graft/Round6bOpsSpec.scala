package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, JoinOps, TextOps}

/** Semantic + plan tests for the round-6 fourth-wave additions
  * (event_anomaly_zscore, event_cooccur_pmi, join_interval_bin,
  * llm_perplexity). The DuckDB value oracles are the correctness gate;
  * these pin what the oracles can't see — the bucketed join's semantic
  * equivalence to the naive non-equi form, conservation laws, and the
  * plan shapes the 100 TB story depends on.
  */
class Round6bOpsSpec extends SparkSpec {

  test("join_interval_bin: bucketed equi-join result EQUALS the naive " +
    "non-equi range join, and the plan is BNLJ/cartesian-free") {
    val widthUs = 6000L * 1000000L
    val baseUs = 1704067200L * 1000000L
    val wins = spark.range(60)
      .select(col("id").as("window_id"),
        (lit(baseUs) + col("id") * lit(43200L * 1000000L)).as("w_start_us"))
    // The naive form the bucketing replaces: a raw range-predicate join
    // (BNLJ — fine in a TEST on 1k rows, the thing to never ship).
    val naive = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"))
      .join(wins, col("t_us") >= col("w_start_us") &&
        col("t_us") < col("w_start_us") + lit(widthUs))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("window_id"))
      .collect().toSeq
    val bucketed = JoinOps.intervalBin(spark, sf0001).collect().toSeq
    assert(bucketed == naive)
    val plan = finalPlan(JoinOps.intervalBin(spark, sf0001))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("join_interval_bin: every interval replicates to at most 2 bins " +
    "(width >= max interval length bounds the fan-out)") {
    val widthUs = 6000L * 1000000L
    val baseUs = 1704067200L * 1000000L
    val nBins = spark.range(60)
      .select((lit(baseUs) + col("id") * lit(43200L * 1000000L))
        .as("w_start_us"))
      .withColumn("w_end_us", col("w_start_us") + lit(widthUs))
      .select(size(sequence(
        expr(s"w_start_us div $widthUs"),
        expr(s"(w_end_us - 1) div $widthUs"))).as("n"))
      .collect().map(_.getAs[Int]("n"))
    assert(nBins.forall(n => n >= 1 && n <= 2))
    assert(nBins.exists(_ == 2), "fixture should exercise the 2-bin case")
  }

  test("event_anomaly_zscore: census conserves the event count, z is " +
    "mean-centered per type, flag agrees with the rounded z") {
    val rows = EventOps.anomalyZscore(spark, sf0001).collect()
    val total = Tables.events(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      // Σ(n - mean) = 0 exactly, so Σz ≈ 0 up to the 4dp rounding.
      val zsum = rs.map(_.getAs[Double]("z")).sum
      assert(math.abs(zsum) < 5e-4 * rs.length)
    }
    rows.foreach { r =>
      assert(r.getAs[Boolean]("flagged") ==
        (math.abs(r.getAs[Double]("z")) > 2.0))
    }
  }

  test("event_cooccur_pmi: pairs ordered a<b, incidence bounded by the " +
    "marginals, PMI bounded above by ln(N / max(n_a, n_b))") {
    val rows = EventOps.cooccurPmi(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nSessions = EventOps.sessionize(spark, sf0001).count()
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("a"), r.getAs[String]("b"))
      val nAb = r.getAs[Long]("n_ab")
      val nA = r.getAs[Long]("n_a")
      val nB = r.getAs[Long]("n_b")
      assert(a < b)
      assert(nAb >= 1 && nAb <= math.min(nA, nB))
      assert(nA <= nSessions && nB <= nSessions)
      val bound = math.log(nSessions.toDouble / math.max(nA, nB).toDouble)
      assert(r.getAs[Double]("pmi") <= bound + 5e-4)
    }
  }

  test("llm_perplexity: covers exactly the docs with a bigram, scores " +
    "positive, flag consistent with the fixed-point threshold") {
    val rows = TextOps.perplexity(spark, sf0001).collect()
    val eligible = Tables.documents(spark, sf0001)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length == eligible)
    rows.foreach { r =>
      val nll = r.getAs[Double]("avg_nll")
      assert(nll > 0.0)
      assert(r.getAs[Long]("n_bigrams") >= 1L)
      val f = r.getAs[Boolean]("flagged")
      // The flag compares exact integers at 3.7; away from the rounding
      // boundary it must agree with the rounded score.
      if (math.abs(nll - 3.7) > 1e-3) assert(f == (nll > 3.7))
    }
  }

  test("llm_ann_srp: recall@5 >= 0.4 vs the brute-force baseline on the " +
    "iid fixture (SRP's worst case), and each neighbor surfaces once") {
    import graft.operators.SimOps
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
    val srp = pairs(SimOps.annSrp(spark, sf0001))
    assert(srp.distinct.length == srp.length,
      "a multi-band collision leaked duplicate candidate rows")
    val exact = pairs(SimOps.simTopk(spark, sf0001)).toSet
    val recall = srp.count(exact) .toDouble / exact.size
    assert(recall >= 0.4, s"recall@5 = $recall (measured 0.55 on this " +
      "fixture; near-orthogonal iid vectors are SRP's floor)")
  }

  test("llm_ann_srp FromStore: the persisted LSH table round-trips to " +
    "the exact inline result") {
    import graft.operators.SimOps
    val dir = java.nio.file.Files.createTempDirectory("graft_srp").toString
    SimOps.srpTableArtifact(spark, sf0001)
      .write.mode("overwrite").parquet(s"$dir/srp_table.parquet")
    val stored = spark.read.parquet(s"$dir/srp_table.parquet")
    val inline = SimOps.annSrp(spark, sf0001).collect().toSeq
    val served = SimOps.annSrpFromStore(spark, sf0001, stored)
      .collect().toSeq
    assert(inline == served)
  }

  test("llm_url_dedup: canonical groups partition the corpus, keeper is " +
    "a member, and the classic variants collapse") {
    import graft.operators.CurationOps
    val rows = CurationOps.urlDedup(spark, sf0001).collect()
    val total = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_variants")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct_raw") <= r.getAs[Long]("n_variants"))
      assert(!r.getAs[String]("canon").contains("#"))
      assert(!r.getAs[String]("canon").contains("utm_"))
      assert(!r.getAs[String]("canon").startsWith("http"))
    }
    // scheme/case/slash/utm variants land together; param'd forms apart
    val canons = rows.map(_.getAs[String]("canon")).toSet
    assert(canons.contains("example.org/articles/0"))
    assert(canons.contains("example.org/articles/3?a=1&b=2"))
    // spot-check the reusable column on adversarial inputs: host case
    // folds, path/query case is PRESERVED (case-sensitive resources),
    // '?' inside a query keeps the leading param (first-? parse)
    import spark.implicits._
    val got = Seq(
      "https://A.com/x/?utm_source=s&z=1&a=2#f",
      "http://a.com/Path?Z=1",
      "https://a.com/x",
      "HTTPS://A.COM/x?a=1?b=2").toDF("url")
      .select(CurationOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a.com/x?a=2&z=1", "a.com/Path?Z=1", "a.com/x",
      "a.com/x?a=1?b=2"), got.toString)
  }

  test("llm_perplexity FromStore: the persisted LM round-trips to the " +
    "exact inline result") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    TextOps.lmArtifact(spark, sf0001)
      .write.mode("overwrite").parquet(s"$dir/lm.parquet")
    val stored = spark.read.parquet(s"$dir/lm.parquet")
    val inline = TextOps.perplexity(spark, sf0001).collect().toSeq
    val served = TextOps.perplexityFromStore(spark, sf0001, stored)
      .collect().toSeq
    assert(inline == served)
  }

  test("dq_freshness: per-type counts conserve the log, lag is " +
    "non-negative against the post-fixture instant, stale agrees") {
    import graft.operators.DataQualityOps
    val rows = DataQualityOps.freshness(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sf0001).count())
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag_s")
      assert(lag >= 0, "monitoring instant precedes an event")
      assert(r.getAs[Boolean]("stale") == (lag > 3600L))
      assert(r.getAs[Long]("n_last_24h") <= r.getAs[Long]("n_events"))
    }
  }

  test("llm_oov_rate: token counts conserve, the vocabulary keeps rates " +
    "strictly below 1, and a top-20-of-40 vocab leaves real OOV mass") {
    val rows = TextOps.oovRate(spark, sf0001).collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val oov = r.getAs[Long]("n_oov")
      assert(oov >= 0 && oov <= n)
      assert(r.getAs[Double]("oov_rate") <= 1.0)
    }
    val totalOov = rows.map(_.getAs[Long]("n_oov")).sum
    assert(totalOov > 0, "a 20-of-40-word vocab must leave OOV tokens")
    val totalTok = rows.map(_.getAs[Long]("n_tokens")).sum
    assert(totalOov < totalTok, "the top-20 vocab must cover real mass")
  }

  test("ts_resample_linear: contiguous hourly grid per user, observed " +
    "hours reproduce their readings, interpolants stay inside the span") {
    val rows = EventOps.resampleLinear(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("hr"),
        r.getAs[Double]("value_interp")))
    // grid contiguity: consecutive rows per user are exactly 1h apart
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val hrs = rs.map(_._2.getTime).sorted
      hrs.sliding(2).foreach {
        case Array(a, b) => assert(b - a == 3600000L)
        case _ =>
      }
    }
    // observed hours carry their own reading; interpolants bounded by
    // the surrounding observations
    val hourly = Tables.events(spark, sf0001)
      .filter(col("ts") < lit("2024-01-08").cast("timestamp"))
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(max_by(col("value"), col("ts")).as("v_obs"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("hr").getTime,
        r.getAs[Double]("v_obs"))).toSeq
    val obsMap = hourly.map(t => (t._1, t._2) -> t._3).toMap
    rows.foreach { case (u, hr, v) =>
      obsMap.get((u, hr.getTime)).foreach { exact =>
        assert(math.abs(v - math.round(exact * 100) / 100.0) < 1e-9,
          s"observed hour must reproduce its reading: $u $hr $v vs $exact")
      }
    }
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val span = hourly.filter(_._1 == u)
      val (lo, hi) = (span.map(_._3).min, span.map(_._3).max)
      rs.foreach { case (_, _, v) =>
        assert(v >= lo - 0.01 && v <= hi + 0.01) }
    }
  }

  test("event_ab_lift: arms partition the users, derived columns agree " +
    "with the exact counters") {
    val r = EventOps.abLift(spark, sf0001).collect()(0)
    val nUsers = Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    val (nc, nt) = (r.getAs[Long]("n_control"), r.getAs[Long]("n_treat"))
    assert(nc + nt == nUsers)
    assert(r.getAs[Long]("conv_control") <= nc)
    assert(r.getAs[Long]("conv_treat") <= nt)
    val lift = r.getAs[Double]("lift")
    assert(math.abs(lift - (r.getAs[Double]("cvr_treat") -
      r.getAs[Double]("cvr_control"))) < 2e-4)
    if (!r.isNullAt(r.fieldIndex("z")))
      assert(r.getAs[Boolean]("significant") ==
        (math.abs(r.getAs[Double]("z")) > 1.96))
  }

  test("mm_dedup_phash: distinct payload distributions separate, " +
    "identical payloads collide, census conserves the corpus") {
    import graft.operators.MultimodalOps
    // discrimination: three byte distributions → three different hashes
    val letters = "the quick brown fox".getBytes("UTF-8")
    val digits = "0123456789012345678".getBytes("UTF-8")
    val mixed = "abc 123 ABC !!! ???".getBytes("UTF-8")
    val hashes = Seq(letters, digits, mixed)
      .map(b => MultimodalOps.phashOf(MultimodalOps.decodeStub(b)))
    assert(hashes.distinct.length == 3,
      s"distinct distributions should separate, got $hashes")
    // identity: same bytes, same hash
    assert(MultimodalOps.phashOf(MultimodalOps.decodeStub(letters)) ==
      hashes.head)
    // census: bucket sizes sum to the corpus
    val rows = MultimodalOps.mmDedupPhash(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf0001).count())
    rows.foreach(r => assert(r.getAs[Long]("keeper_doc") >= 0))
  }

  test("llm_perplexity: driver-side Scala recomputation matches every " +
    "doc's fixed-point score exactly (independent execution path)") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ", -1).toSeq)
    val bigrams = docs.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
    val nAb = bigrams.groupBy(identity).map { case (k, v) => k -> v.size }
    val nA = bigrams.groupBy(_._1).map { case (k, v) => k -> v.size }
    def lq(p: (String, String)): Long =
      BigDecimal(math.log(nAb(p).toDouble / nA(p._1).toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = docs.flatMap { case (id, ts) =>
      val ps = ts.zip(ts.drop(1))
      if (ps.isEmpty) None else {
        val sumLq = ps.map(lq).sum
        val n = ps.size.toLong
        // fixed-point: integer micro-nats per bigram, then one exact
        // division — mirrors the operator, no decimal rounding anywhere
        val avg = ((-sumLq) / n).toDouble / 1e6
        Some(id -> ((n, avg, -sumLq > 3700000L * n)))
      }
    }.toMap
    val rows = TextOps.perplexity(spark, sf0001).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, avg, fl) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bigrams") == n)
      assert(r.getAs[Double]("avg_nll") == avg)
      assert(r.getAs[Boolean]("flagged") == fl)
    }
  }
}
