package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.{AggOps, DataQualityOps, GraphOps, JoinOps,
  MultimodalOps, TextOps}

/** Semantic + plan tests for the eighth-wave operators (graph_pagerank,
  * agg_hll_portable, agg_bloom_portable, llm_bpe_merge_step, mm_shard_pack,
  * dq_benford, join_skew_salted). The DuckDB value oracles are the
  * correctness gate; these tests pin what the oracles can't — full
  * independent driver recomputations (sequential-algorithm references for
  * the greedy BPE merge and the shard packer, raw-md5 rebuilds of the
  * sketches, a hand-rolled power iteration for PageRank) and the plan
  * shapes the 100 TB story depends on.
  */
class Wave8OpsSpec extends SparkSpec {

  private def md5hex8(s: String): Long =
    java.lang.Long.parseLong(MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x")
      .mkString, 16)

  test("graph_pagerank: hand-rolled power iteration reproduces every rank") {
    val got = GraphOps.pagerank(spark, sf0001).collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[Long]("rank_micro"))
      .toMap
    assert(got.size == 25)
    // independent reference: collect the raw joins, aggregate + iterate
    // sequentially on the driver with the same integer truncation
    val rows = Tables.lineitem(spark, sf0001)
      .join(Tables.supplier(spark, sf0001),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("s_nationkey")).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val w = rows.groupBy(identity).map { case (e, xs) => e -> xs.length.toLong }
    val outw = w.groupBy(_._1._1).map { case (s0, es) => s0 -> es.values.sum }
    var rank = (0 until 25).map(_ -> 40000L).toMap
    for (_ <- 1 to 3) {
      val inflow = w.toSeq
        .map { case ((src, dst), wt) => dst -> (rank(src) * wt / outw(src)) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      rank = (0 until 25)
        .map(n => n -> (6000L + 850000L * inflow.getOrElse(n, 0L) / 1000000L))
        .toMap
    }
    assert(got == rank)
    // truncation only destroys mass — never creates it
    assert(got.values.sum <= 1000000L)
    assert(got.values.forall(_ >= 6000L))
  }

  test("graph_pagerank: iterations reuse the checkpointed edge list — " +
    "the fact tables are scanned exactly once") {
    val plan = finalPlan(GraphOps.pagerank(spark, sf0001))
    // the eager localCheckpoint materializes the fact joins before the
    // output plan exists; re-running them 3× would show fact scans here
    // (the dimension-sized nation lookup still scans parquet — that's the
    // one legitimate file read in the output plan)
    Seq("lineitem", "orders", "customer", "supplier").foreach { t =>
      assert(!plan.contains(t), s"$t rescanned in the iteration plan")
    }
  }

  test("agg_hll_portable: raw-md5 driver rebuild matches registers and " +
    "estimate; accuracy within the m=32 error envelope") {
    val got = AggOps.hllPortable(spark, sf0001).collect()
    assert(got.length == 3)
    val keys = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_partkey")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    got.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val regs = new Array[Int](32)
      keys.filter(_._1 == flag).foreach { case (_, pk) =>
        val hv = md5hex8(pk.toString)
        val (bucket, w) = ((hv % 32).toInt, hv / 32)
        val rho = if (w == 0) 28 else 28 - java.lang.Long.toBinaryString(w).length
        regs(bucket) = math.max(regs(bucket), rho)
      }
      val s = regs.map(m0 => 1L << (32 - m0)).sum
      assert(r.getAs[Long]("harmonic_s") == s)
      assert(r.getAs[Long]("zero_registers") == regs.count(_ == 0))
      assert(r.getAs[Long]("hll_est") ==
        697000L * 1024 * 4294967296L / s / 1000000L)
      val n = r.getAs[Long]("n_exact")
      // 3σ for m=32 is ~3·1.04/√32 ≈ 0.55 relative — loose gate, the
      // exact value equality above is the real assertion
      assert(math.abs(r.getAs[Long]("hll_est") - n) <= math.max(3, n * 6 / 10))
    }
  }

  test("agg_bloom_portable: raw-md5 driver rebuild matches every verdict; " +
    "no false negatives ever") {
    val got = AggOps.bloomPortable(spark, sf0001).collect()
    val build = Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    val bits = scala.collection.mutable.Set[Long]()
    for (k <- build; i <- 0 until 4)
      bits += md5hex8(s"$i:$k") % 256
    got.foreach { r =>
      val ck = r.getAs[Long]("c_custkey")
      val hit = (0 until 4).forall(i => bits.contains(md5hex8(s"$i:$ck") % 256))
      assert(r.getAs[Boolean]("bloom_hit") == hit)
      assert(r.getAs[Boolean]("truly_present") == build.contains(ck))
      assert(r.getAs[Boolean]("no_false_negative"))
      assert(r.getAs[Boolean]("is_false_positive") == (hit && !build.contains(ck)))
    }
    // the filter must do SOME filtering at this sizing (m=256, k=4)
    val fp = got.count(_.getAs[Boolean]("is_false_positive"))
    val neg = got.count(r => !r.getAs[Boolean]("truly_present"))
    assert(neg == 0 || fp < neg, s"fp=$fp of $neg negatives")
  }

  test("llm_bpe_merge_step: sequential greedy reference reproduces the " +
    "windowed merge, including self-pair runs") {
    val docs = Tables.documents(spark, sf0001).select(col("text")).collect()
      .map(_.getString(0).split(" ").toSeq)
    val pairs = docs.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val (a, b) = pairs.toSeq.minBy { case ((x, y), n) => (-n, x, y) }._1
    // reference: one sequential greedy left-to-right pass per doc
    def mergeSeq(t: Seq[String]): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < t.length) {
        if (i + 1 < t.length && t(i) == a && t(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += t(i); i += 1 }
      }
      out.toSeq
    }
    val recount = docs.map(mergeSeq).flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val want = recount.toSeq.sortBy { case ((x, y), n) => (-n, x, y) }.take(10)
      .map { case ((x, y), n) => (a + b, x, y, n) }
    val got = TextOps.bpeMergeStep(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == want)
  }

  test("llm_bpe_merge_step: greedy parity on an adversarial self-pair run") {
    // not reachable from the fixture's top pair — pin the islands logic
    // directly: 'x x x x x' under merge (x,x) must yield 'xx xx x'
    val t = Seq("x", "x", "x", "x", "x")
    val matches = t.indices.dropRight(1).filter(i => t(i) == "x" && t(i + 1) == "x")
    // islands parity: consecutive match runs keep odd run-offsets
    val kept = matches.zipWithIndex.collect {
      case (pos, rn) if (pos - rn) >= 0 && rn % 2 == 0 => pos
    }
    assert(kept == Seq(0, 2)) // merges at 0–1 and 2–3; position 4 survives
  }

  test("mm_shard_pack: sequential packer reproduces the manifest; overrun " +
    "bounded by one record") {
    val cap = 2000L
    val sized = MultimodalOps.mediaTable(spark, sf0001)
      .join(Tables.documents(spark, sf0001)
        .select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("doc_id"), length(col("media")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong))
    val assigned = sized.groupBy(_._1).toSeq.flatMap { case (src, rs) =>
      var cum = 0L
      rs.sortBy(_._2).toSeq.map { case (_, id, n) =>
        val shard = cum / cap; cum += n; (src, shard, id, n)
      }
    }
    val want = assigned.groupBy(t => (t._1, t._2)).map { case ((src, sh), xs) =>
      (src, sh) -> ((xs.size.toLong, xs.map(_._4).sum,
        xs.map(_._3).min, xs.map(_._3).max))
    }
    val got = MultimodalOps.shardPack(spark, sf0001).collect().map { r =>
      (r.getString(0), r.getLong(1)) -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("shard_bytes"), r.getAs[Long]("first_doc"),
        r.getAs[Long]("last_doc")))
    }.toMap
    assert(got == want)
    val maxRec = sized.map(_._3).max
    got.values.foreach { case (_, bytes, _, _) =>
      assert(bytes < cap + maxRec)
    }
  }

  test("dq_benford: shares sum to 10⁶ minus truncation dust; deviations " +
    "recompute") {
    val rows = DataQualityOps.benford(spark, sf0001).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSet.subsetOf((1 to 9).toSet))
    val obsSum = rows.map(_.getAs[Long]("obs_micro")).sum
    assert(obsSum <= 1000000L && obsSum > 1000000L - 9)
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_micro") ==
        math.abs(r.getAs[Long]("obs_micro") - r.getAs[Long]("exp_micro")))
    }
  }

  test("join_skew_salted: salted result equals the plain join") {
    val plain = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("qty_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = JoinOps.skewSalted(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
