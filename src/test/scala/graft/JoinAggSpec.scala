package graft

import graft.operators.{AggOps, JoinOps}

class JoinAggSpec extends SparkSpec {
  test("join_inner_equi preserves every lineitem (FK is total)") {
    assert(JoinOps.innerEqui(spark, sf0001).count() ===
      Tables.lineitem(spark, sf0001).count())
  }

  test("join_semi + join_anti partition customers against the same build side") {
    val semiHi = Tables.customer(spark, sf0001)
      .join(Tables.orders(spark, sf0001)
          .filter(org.apache.spark.sql.functions.col("o_totalprice") > 300000),
        org.apache.spark.sql.functions.col("c_custkey") ===
          org.apache.spark.sql.functions.col("o_custkey"), "left_semi")
      .count()
    val anti = JoinOps.anti(spark, sf0001).count()
    assert(semiHi + anti === Tables.customer(spark, sf0001).count())
  }

  test("agg_hash_group counts cover all of lineitem") {
    val rows = AggOps.hashGroup(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("n")).sum ===
      Tables.lineitem(spark, sf0001).count())
  }

  test("agg_rollup grand-total row equals table count") {
    val rows = AggOps.rollupAgg(spark, sf0001).collect()
    val total = rows.head // nulls sort first → grand total is row 0
    assert(total.isNullAt(0) && total.isNullAt(1))
    assert(total.getAs[Long]("n_cust") ===
      Tables.customer(spark, sf0001).count())
  }

  test("agg_quantile_portable: n_sample capped at k, estimates within " +
      "sample-sketch accuracy of exact quantiles") {
    val rows = AggOps.quantilePortable(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Tables.orders(spark, sf0001).groupBy("o_orderstatus")
      .agg(org.apache.spark.sql.functions.expr(
        "percentile(o_totalprice, 0.5)").as("p50"),
        org.apache.spark.sql.functions.expr(
          "percentile(o_totalprice, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> r).toMap
    exact.foreach { case (st, e) =>
      val r = rows(st)
      assert(r.getAs[Long]("n_sample") <= 100L)
      // k=100 uniform sample: order-statistic error is sketch-class,
      // deterministic on the fixed fixture (observed max ~15%)
      val err50 = math.abs(r.getAs[Double]("est_p50") -
        e.getAs[Double]("p50")) / e.getAs[Double]("p50")
      val err90 = math.abs(r.getAs[Double]("est_p90") -
        e.getAs[Double]("p90")) / e.getAs[Double]("p90")
      assert(err50 < 0.25, s"$st: p50 err $err50")
      assert(err90 < 0.25, s"$st: p90 err $err90")
    }
  }

  test("approxSketch library fn: HLL within 5% of exact, median sketch " +
      "within 2% (query slot retired to agg_quantile_portable in r12)") {
    val approx = AggOps.approxSketch(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = AggOps.countDistinctAgg(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_parts")).toMap
    val exactP50 = AggOps.percentileAgg(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("qty_p50")).toMap
    exact.foreach { case (flag, nExact) =>
      val nApprox = approx(flag).getAs[Long]("approx_parts")
      assert(math.abs(nApprox - nExact).toDouble / nExact < 0.05,
        s"$flag: HLL $nApprox vs exact $nExact")
    }
    // approx_percentile returns an element of the dataset near the median
    val priceExact = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.expr(
        "percentile(l_extendedprice, 0.5)").as("p"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("p")).toMap
    priceExact.foreach { case (flag, p) =>
      val ap = approx(flag).getAs[Double]("approx_price_p50")
      assert(math.abs(ap - p) / p < 0.02, s"$flag: approx $ap vs exact $p")
    }
    assert(exactP50.nonEmpty)
  }

  // KMV estimate quality: error ~1/sqrt(k) = 12.5% at k=64 — assert a
  // 3-sigma-ish 40% bound per group, and exactness when n <= k.
  test("agg_kmv_distinct: estimate within KMV error of exact; small groups exact") {
    val kmv = AggOps.kmvDistinct(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = AggOps.countDistinctAgg(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_parts")).toMap
    assert(kmv.nonEmpty)
    exact.foreach { case (flag, nExact) =>
      val est = kmv(flag).getAs[Double]("kmv_estimate")
      val n = kmv(flag).getAs[Long]("n_exact")
      assert(n === nExact)
      if (n <= 64) assert(est === n.toDouble, s"$flag: n<=k must be exact")
      else assert(math.abs(est - nExact) / nExact < 0.4,
        s"$flag: KMV $est vs exact $nExact")
    }
  }

  test("agg_kmv_setops: merged-sketch union/intersection track the exact values") {
    import org.apache.spark.sql.functions._
    val got = AggOps.kmvSetops(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.size === 3) // A/N/R pairs
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_partkey")).distinct().collect()
      .groupBy(_.getString(0))
      .map { case (f, rows) => f -> rows.map(_.getAs[Long]("l_partkey")).toSet }
    got.foreach { case ((a, b), r) =>
      val exactU = (li(a) | li(b)).size.toDouble
      val exactI = (li(a) & li(b)).size.toDouble
      val estU = r.getAs[Double]("union_est")
      val estI = r.getAs[Double]("inter_est")
      // union: the same 1/sqrt(64) ≈ 12.5% sketch error, 3σ-ish bound;
      // intersection compounds Jaccard noise — looser bound
      assert(math.abs(estU - exactU) / exactU < 0.4, s"$a/$b union $estU vs $exactU")
      assert(math.abs(estI - exactI) / exactI < 0.6, s"$a/$b inter $estI vs $exactI")
    }
  }

  // The moment-derived statistics must BE variance/correlation: compare
  // against Spark's built-in streaming implementations within float noise.
  test("agg_stats_moments matches built-in var_samp/corr within 1e-9 rel") {
    import org.apache.spark.sql.functions._
    val got = AggOps.statsMoments(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val want = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(var_samp(col("l_quantity")).as("v"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet === want.keySet && got.nonEmpty)
    def close(a: Double, b: Double) = math.abs(a - b) <=
      1e-9 * math.max(math.abs(a), math.abs(b))
    got.foreach { case (k, r) =>
      assert(close(r.getAs[Double]("var_qty"), want(k).getAs[Double]("v")),
        s"$k variance")
      assert(close(r.getAs[Double]("corr_qty_price"),
        want(k).getAs[Double]("c")), s"$k correlation")
    }
  }

  test("join_asof: prev_signup_ts is strictly before ts when present") {
    val bad = JoinOps.asOf(spark, sf0001)
      .filter("prev_signup_ts IS NOT NULL AND prev_signup_ts > ts")
      .count()
    assert(bad === 0L)
  }
}
