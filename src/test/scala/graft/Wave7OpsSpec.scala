package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, EventOps, MultimodalOps, TextOps}

/** Semantic + plan tests for the seventh-wave operators (event_markov,
  * ts_ewma, llm_char_entropy, llm_sample_temperature, mm_phash_hamming,
  * llm_novelty_rate). The DuckDB value oracles are the correctness gate;
  * these tests pin what the oracles can't see — full independent driver
  * recomputations of the fixed-point arithmetic, cross-row consistency,
  * the artifact-store round trip, and the plan shapes the 100 TB story
  * depends on.
  */
class Wave7OpsSpec extends SparkSpec {

  test("event_markov: per-state totals, fixed-point p, session-bounded " +
    "step count") {
    val rows = EventOps.markovTransitions(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val types = Set("click", "view", "purchase", "signup", "error")
    rows.foreach { r =>
      assert(types.contains(r.getAs[String]("a")))
      assert(types.contains(r.getAs[String]("b")))
    }
    rows.groupBy(_.getAs[String]("a")).foreach { case (a, rs) =>
      val nA = rs.head.getAs[Long]("n_a")
      assert(rs.forall(_.getAs[Long]("n_a") == nA), s"n_a split for $a")
      assert(rs.map(_.getAs[Long]("n_ab")).sum == nA,
        s"n_ab sum != n_a for $a")
      rs.foreach { r =>
        val want = (r.getAs[Long]("n_ab") * 10000L / nA).toDouble / 10000.0
        assert(r.getAs[Double]("p") == want)
      }
    }
    // every within-session step is counted exactly once: a session of
    // length L yields L-1 steps, so Σ n_ab = Σ (n_events - 1) and the
    // transition census can neither leak steps across the session
    // boundary nor drop in-session ones
    val perSession = EventOps.sessionize(spark, sf0001)
      .agg(sum(col("n_events") - 1)).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_ab")).sum == perSession)
  }

  test("ts_ewma: full driver recomputation of the fixed-point average") {
    val got = EventOps.ewma(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        r.getAs[Double]("ewma")).toMap
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts").getTime * 1000 +
          r.getAs[java.sql.Timestamp]("ts").getNanos / 1000 % 1000,
        r.getAs[Double]("value")))
    assert(got.size == ev.length)
    ev.groupBy(_._1).foreach { case (uid, rs) =>
      val ordered = rs.sortBy(r => (r._3, r._2))
        .map(r => (r._2, math.round(r._4 * 100)))
      ordered.indices.foreach { i =>
        val window = ordered.slice(math.max(0, i - 7), i + 1).reverse
        val num = window.zipWithIndex
          .map { case ((_, c), k) => c * (1L << (7 - k)) }.sum
        val den = window.indices.map(k => 1L << (7 - k)).sum
        val want = (num * 100 / den).toDouble / 10000.0
        assert(got((uid, ordered(i)._1)) == want,
          s"user $uid event ${ordered(i)._1}")
      }
    }
  }

  test("ts_ewma plan: all 8 lags share ONE exchange and ONE sort") {
    val p = finalPlan(EventOps.ewma(spark, sf0001))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    // one exchange for the window, one range exchange for the output sort
    assert(exchanges == 1, s"expected 1 hash exchange:\n$p")
    val windows = "\\bWindow\\b".r.findAllIn(p).length
    assert(windows == 1, s"expected a single Window operator:\n$p")
  }

  test("llm_char_entropy: full driver recomputation of the micro-nat sum") {
    val got = TextOps.charEntropy(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("len"), r.getAs[Long]("n_distinct_chars"),
          r.getAs[Double]("entropy_nats"), r.getAs[Boolean]("low_entropy")))
      .toMap
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
    assert(got.size == docs.length)
    docs.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val text = r.getAs[String]("text")
      val len = text.length.toLong
      val counts = text.toCharArray.groupBy(identity).map(_._2.length.toLong)
      val hsum = counts.map { c =>
        c * math.round(math.log(len.toDouble / c) * 1e6)
      }.sum
      val (gLen, gDistinct, gEntropy, gLow) = got(id)
      assert(gLen == len)
      assert(gDistinct == counts.size.toLong)
      assert(gEntropy == hsum.toDouble / (len.toDouble * 1e6), s"doc $id")
      assert(gLow == (hsum < 2000000L * len))
    }
  }

  test("llm_sample_temperature: budget respected, ranks contiguous, " +
    "high-resource language down-weighted") {
    val sel = TextOps.sampleTemperature(spark, sf0001).collect()
    assert(sel.length <= 200 && sel.length > 150)
    sel.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val target = rs.head.getAs[Long]("target")
      assert(rs.length.toLong <= target)
      // the budget fills in rank order with no gaps
      assert(rs.map(_.getAs[Long]("sample_rank")).sorted.toSeq ===
        (1L to rs.length).toSeq, s"ranks not contiguous for $lang")
    }
    // temperature flattening: en's share of the sample must sit BELOW its
    // raw corpus share (that is the entire point of α < 1)
    val docs = Tables.documents(spark, sf0001).groupBy(col("lang")).count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count"))
      .toMap
    val corpusEn = docs("en").toDouble / docs.values.sum
    val sampleEn = sel.count(_.getAs[String]("lang") == "en").toDouble /
      sel.length
    assert(sampleEn < corpusEn,
      s"sample en share $sampleEn !< corpus $corpusEn")
  }

  test("mm_phash_hamming: radius bound, null consistency, equi-join plan") {
    val df = MultimodalOps.mmPhashHamming(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_near")
      if (n == 0L) {
        assert(r.isNullAt(r.fieldIndex("best_nbr")))
        assert(r.isNullAt(r.fieldIndex("best_ham")))
      } else {
        assert(r.getAs[Long]("best_ham") <= 3L)
        assert(r.getAs[Long]("best_nbr") % 25 != 0L ||
          r.getAs[Long]("best_nbr") != r.getAs[Long]("probe_id"))
      }
    }
    // the multi-index candidates come from band equi-joins — never a
    // cartesian or nested-loop pairing of the corpus
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("set_except_all / set_intersect_all: bag multiplicity laws hold") {
    import graft.operators.SortSetOps
    def keyOf(r: org.apache.spark.sql.Row) =
      r.getAs[Number](0).longValue()
    val cust = Tables.customer(spark, sf0001)
      .groupBy(col("c_nationkey")).count().collect()
      .map(r => keyOf(r) -> r.getLong(1)).toMap
    val supp = Tables.supplier(spark, sf0001)
      .groupBy(col("s_nationkey")).count().collect()
      .map(r => keyOf(r) -> r.getLong(1)).toMap
    val exceptCounts = SortSetOps.exceptAllKeys(spark, sf0001).collect()
      .groupBy(keyOf).map { case (k, rs) => k -> rs.length.toLong }
    val intersectCounts = SortSetOps.intersectAllKeys(spark, sf0001)
      .collect()
      .groupBy(keyOf).map { case (k, rs) => k -> rs.length.toLong }
    (cust.keySet ++ supp.keySet).foreach { k =>
      val c = cust.getOrElse(k, 0L)
      val s = supp.getOrElse(k, 0L)
      assert(exceptCounts.getOrElse(k, 0L) == math.max(0L, c - s), s"k=$k")
      assert(intersectCounts.getOrElse(k, 0L) == math.min(c, s), s"k=$k")
    }
  }

  test("event_rfm: segment agrees with its own fields; metrics sane") {
    val rows = EventOps.rfm(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rec = r.getAs[Long]("recency_days")
      val f = r.getAs[Long]("frequency")
      val seg = r.getAs[String]("segment")
      assert(rec >= 0L && f >= 1L && r.getAs[Double]("monetary") > 0.0)
      val want =
        if (rec <= 3 && f >= 14) "champion"
        else if (rec <= 3) "recent"
        else if (f >= 14) "loyal"
        else "dormant"
      assert(seg == want)
    }
  }

  test("dq_anomaly_mad: robust-stat invariants") {
    val rows = graft.operators.DataQualityOps.anomalyMad(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mad = r.getAs[Double]("mad")
      assert(mad >= 0.0)
      assert(r.getAs[Double]("max_abs_dev") >= mad)
      // the census counts a strict minority as outliers by construction
      // of the MAD threshold (breakdown point 1/2)
      assert(r.getAs[Long]("n_outliers") * 2 < r.getAs[Long]("n"))
    }
  }

  test("llm_novelty_rate from a persisted artifact store == from text") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nov").toString
    val docs = Tables.documents(spark, sf0001)
    val k = Tables.snapshotBoundary(spark, sf0001, "documents")
    DedupOps.snapshotArtifacts(spark, docs.filter(col("doc_id") < k))
      .write.mode("overwrite").parquet(s"$dir/artifacts")
    val persisted = spark.read.parquet(s"$dir/artifacts")
    val fromStore = DedupOps.noveltyFromStore(spark, persisted,
      docs.filter(col("doc_id") >= k)).collect()
    val fromText = DedupOps.noveltyRate(spark, sf0001).collect()
    assert(fromStore.nonEmpty)
    assert(fromStore.toSeq === fromText.toSeq)
    fromText.foreach { r =>
      val n = r.getAs[Long]("n_shingles")
      val nov = r.getAs[Long]("n_novel")
      assert(n > 0 && nov >= 0 && nov <= n)
      val rate = r.getAs[Double]("novelty")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Boolean]("mostly_novel") == (2 * nov >= n))
    }
  }
}
