package graft

import org.apache.spark.sql.functions._

import graft.operators.{CurationOps, GraphOps, SimOps, TextOps}

/** Round-15 second wave: Kneser–Ney smoothing, CCNet quality buckets,
  * the oracled hierarchical-IVF query, and label-propagation communities
  * — each pinned against a driver-side independent model, not just the
  * DuckDB oracle.
  */
class Round15bOpsSpec extends SparkSpec {

  /** Driver-side KN model from raw text — the independent route: bigram
    * census via plain Scala maps, probabilities in the exact operator
    * order the engine's expression uses.
    */
  private def knModel(): (Map[(String, String), Long], Map[(String, String), Double]) = {
    val texts = Tables.documents(spark, sf0001)
      .select(col("text")).collect().map(_.getString(0))
    val nAb = scala.collection.mutable.Map[(String, String), Long]()
    texts.foreach { t =>
      val toks = t.split(" ")
      toks.sliding(2).foreach {
        case Array(a, b) =>
          nAb((a, b)) = nAb.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val nA = nAb.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val n1pA = nAb.groupBy(_._1._1).map { case (a, m) => a -> m.size.toLong }
    val n1pB = nAb.groupBy(_._1._2).map { case (b, m) => b -> m.size.toLong }
    val nTypes = nAb.size.toLong
    val p = nAb.map { case ((a, b), ab) =>
      (a, b) -> (math.max(ab.toDouble - 0.75, 0.0) / nA(a).toDouble +
        0.75 * n1pA(a).toDouble / nA(a).toDouble *
          (n1pB(b).toDouble / nTypes.toDouble))
    }.toMap
    (nAb.toMap, p)
  }

  test("kneserNeyAll: matches a driver-side KN model pair-for-pair, and " +
    "the interpolated distribution normalizes over the full vocabulary") {
    val (nAb, model) = knModel()
    val got = TextOps.kneserNeyAll(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_ab"), r.getAs[Long]("p_kn_micro"))).toMap
    assert(got.keySet === nAb.keySet)
    got.foreach { case (k, (ab, micro)) =>
      assert(ab === nAb(k), s"count for $k")
      assert(micro === math.round(model(k) * 1000000.0), s"p for $k")
    }
    // Normalization: Σ_b p_KN(b|a) over the FULL vocabulary is exactly 1
    // (observed pairs carry the discounted term; unobserved pairs get
    // λ(a)·p_cont(b); Σ_b N1+(·b) = N1+(··)). Check it on the driver
    // model for the 5 highest-fan-out contexts.
    val nA = nAb.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val n1pA = nAb.groupBy(_._1._1).map { case (a, m) => a -> m.size.toLong }
    val n1pB = nAb.groupBy(_._1._2).map { case (b, m) => b -> m.size.toLong }
    val nTypes = nAb.size.toLong
    val vocabB = n1pB.keySet
    n1pA.toSeq.sortBy(-_._2).take(5).foreach { case (a, _) =>
      val lambda = 0.75 * n1pA(a).toDouble / nA(a).toDouble
      val obs = vocabB.filter(b => nAb.contains((a, b)))
      val sum = obs.toSeq.map(b => model((a, b))).sum +
        (vocabB -- obs).toSeq
          .map(b => lambda * (n1pB(b).toDouble / nTypes.toDouble)).sum
      assert(math.abs(sum - 1.0) < 1e-9, s"normalization for a=$a: $sum")
    }
  }

  test("qualityBuckets: per-language buckets are value-monotone, cover " +
    "every scored doc, and land within one doc of exact terciles") {
    val micro = TextOps.perplexityMicro(spark, sf0001,
      TextOps.lmArtifact(spark, sf0001))
      .select(col("doc_id"), col("avg_nll_micro")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val langs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = CurationOps.qualityBuckets(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.map(_._1).toSet === micro.keySet)
    got.foreach { case (id, lang, _) => assert(lang === langs(id)) }
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_._3)
        .view.mapValues(_.map(r => micro(r._1))).toMap
      assert(byBucket.keySet === Set("head", "middle", "tail"),
        s"$lang missing a bucket")
      assert(byBucket("head").max <= byBucket("middle").min, s"$lang h/m")
      assert(byBucket("middle").max <= byBucket("tail").min, s"$lang m/t")
      // tercile cutoffs ⇒ each bucket holds n/3 ± interpolation slack
      val n = rows.length
      byBucket.values.foreach(b =>
        assert(math.abs(b.size - n / 3.0) <= 2.0,
          s"$lang bucket sizes ${byBucket.view.mapValues(_.size).toMap}"))
    }
  }

  test("perplexityKnFrames: all three backoff branches verified against " +
    "a hand-computed KN model") {
    import spark.implicits._
    // train "x y x z": n(x,y)=n(y,x)=n(x,z)=1; n_a: x=2 (2 conts),
    // y=1 (1 cont); N1+(·b): x=1, y=1, z=1; 3 bigram types.
    val train = Seq((1L, "x y x z")).toDF("doc_id", "text")
    // score "x y q r y": (x,y) fully seen; (y,q) a-seen pair-unseen with
    // unseen b (λ·0 → floor); (q,r) a-unseen b-unseen (0 → floor);
    // (r,y) a-unseen b-seen (continuation backoff 1/3)
    val score = Seq((10L, "x y q r y")).toDF("doc_id", "text")
    val got = TextOps.perplexityKnFrames(spark, train, score).collect()
    assert(got.length === 1)
    val r = got.head
    def lq(p: Double): Long = math.round(math.log(math.max(p, 1e-9)) * 1e6)
    val pXY = math.max(1.0 - 0.75, 0.0) / 2.0 + 0.75 * 2.0 / 2.0 * (1.0 / 3.0)
    val sumLq = lq(pXY) + lq(0.0) + lq(0.0) + lq(1.0 / 3.0)
    val expectedAvg = (-sumLq / 4L).toDouble / 1e6 // exact-int div, then /1e6
    assert(r.getLong(1) === 4L, "n_bigrams")
    assert(r.getLong(2) === 3L, "n_unseen")
    assert(r.getDouble(3) === expectedAvg, "avg_nll")
  }

  test("perplexityServed + qualityBucketsServed: byte-identical to their " +
    "inline twins (persisted LM + cutoffs, different code path)") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq)
    assert(rows(TextOps.perplexityServed(spark, sf0001)) ===
      rows(TextOps.perplexity(spark, sf0001)))
    assert(rows(CurationOps.qualityBucketsServed(spark, sf0001)) ===
      rows(CurationOps.qualityBuckets(spark, sf0001)))
  }

  test("annIvfHier: the oracled query is row-identical to llm_ann_ivf") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(rows(SimOps.annIvfHier(spark, sf0001)) ===
      rows(SimOps.annIvf(spark, sf0001)))
  }

  test("modularity: degree mass sums to 2m, intra edges bounded by m, " +
    "singletons score exactly 0, Q within [-1, 1]") {
    val m = GraphOps.strongEdges(spark, sf0001).count()
    val rows = GraphOps.modularity(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._3).sum === 2 * m, "sum(d_c) must be 2m")
    assert(rows.map(_._2).sum <= m, "intra-community edges exceed m")
    rows.filter(t => t._1 == 1L && t._3 == 0L).foreach { t =>
      assert(t._2 === 0L && t._4 === 0L, s"isolated singleton must score 0: $t")
    }
    val q = rows.map(_._4).sum
    assert(q >= -1000000L && q <= 1000000L, s"Q out of range: $q")
  }

  test("labelProp: matches a driver-side synchronous LPA over the same " +
    "strong graph; isolated nations keep their own label") {
    def asLong(r: org.apache.spark.sql.Row, i: Int): Long =
      r.get(i).asInstanceOf[Number].longValue
    val strong = GraphOps.strongEdges(spark, sf0001).collect()
      .map(r => (asLong(r, 0), asLong(r, 1)))
    val nodes = Tables.nation(spark, sf0001)
      .select(col("n_nationkey")).collect().map(asLong(_, 0)).toSeq
    val nbrs = (strong ++ strong.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var lbl = nodes.map(v => v -> v).toMap
    (1 to 3).foreach { _ =>
      val prev = lbl
      lbl = nodes.map { v =>
        val votes = nbrs.getOrElse(v, Nil).map(prev)
        if (votes.isEmpty) v -> prev(v)
        else v -> votes.groupBy(identity).view.mapValues(_.size).toSeq
          .minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val got = GraphOps.labelProp(spark, sf0001).collect()
      .map(r => asLong(r, 0) -> asLong(r, 2)).toMap
    assert(got === lbl)
    val inGraph = nbrs.keySet
    nodes.filterNot(inGraph).foreach(v => assert(got(v) === v))
  }
}
