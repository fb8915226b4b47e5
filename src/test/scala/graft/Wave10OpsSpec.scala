package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, GraphOps, TextOps}

/** Round-9 wave-10 additions. */
class Wave10OpsSpec extends SparkSpec {

  test("ts_changepoint_cusum: prefix closed form equals the direct " +
    "max(0, S+dev) recurrence, recomputed on the driver") {
    val rows = EventOps.changepointCusum(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, series) =>
      val ordered = series.sortBy(_.getTimestamp(1).getTime)
      val n = ordered.map(_.getLong(2))
      val t = n.length.toLong
      val total = n.sum
      val dev = n.map(_ * t - total)
      var hi = 0L
      var lo = 0L
      ordered.zip(dev).foreach { case (r, d) =>
        hi = math.max(0L, hi + d)
        lo = math.max(0L, lo - d)
        assert(r.getLong(3) === hi,
          s"cusum_hi mismatch at ${r.getTimestamp(1)}")
        assert(r.getLong(4) === lo,
          s"cusum_lo mismatch at ${r.getTimestamp(1)}")
      }
      // deviations are centered: a full-series CUSUM ends at P_T = 0, so
      // the final hi score equals -min prefix and lo equals +max prefix
      assert(dev.sum === 0L)
    }
  }

  test("graph_bfs_hops: hop distances match a driver-side BFS over the " +
    "same strong edge census") {
    val got = GraphOps.bfsHops(spark, sf0001).collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val edges = GraphOps.strongEdges(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(edges.nonEmpty)
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seed = edges.flatMap(e => Seq(e._1, e._2)).min
    var frontier = Set(seed)
    var dist = Map(seed -> 0L)
    var level = 0L
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .filterNot(dist.contains)
      level += 1
      next.foreach(n => dist += n -> level)
      frontier = next
    }
    assert(got.nonEmpty)
    got.foreach { case (node, hops) =>
      assert(hops === dist.get(node), s"node $node")
    }
  }

  test("event_bot_detect: var_num is the exact n-scaled variance and " +
    "the regularity flag is CV^2 <= 1/4, driver-recomputed") {
    val rows = EventOps.botDetect(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val gaps = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3))
        .map(_._2).toVector.sliding(2).collect { case Seq(a, b) =>
          (b - a) / 1000000L }.toVector).toMap
    rows.foreach { r =>
      val u = r.getLong(0)
      val g = gaps(u)
      val (n, s2, sq) = (g.length.toLong, g.sum, g.map(x => x * x).sum)
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === s2)
      val varNum = n * sq - s2 * s2
      assert(varNum >= 0L)
      assert(r.getLong(3) === varNum, s"user $u")
      assert(r.getBoolean(4) === (4 * varNum <= s2 * s2), s"user $u")
    }
  }

  test("llm_bpe_apply: encoded token counts match a driver-side greedy " +
    "replay of the trained merges") {
    val merges = TextOps.bpeTrain(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(merges.nonEmpty)
    val applied = TextOps.bpeApply(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val texts = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(applied.keySet === texts.keySet)
    applied.foreach { case (id, (orig, enc, bp)) =>
      var toks = texts(id).split(" ", -1).toVector
      assert(orig === toks.length.toLong, s"orig doc $id")
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
      assert(enc === toks.length.toLong, s"enc doc $id")
      assert(bp === enc * 10000L / orig, s"bp doc $id")
    }
  }

  test("llm_rouge_overlap: clipped bigram overlap and F1 match a " +
    "driver-side multiset recompute for every blocked pair") {
    val rows = TextOps.rougeOverlap(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def bigrams(t: String): Map[String, Long] = {
      val toks = t.split(" ", -1)
      toks.sliding(2).map(_.mkString(" ")).toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (ga, gb) = (bigrams(texts(a)), bigrams(texts(b)))
      val o = ga.keySet.intersect(gb.keySet).toSeq
        .map(g => math.min(ga(g), gb(g))).sum
      assert(r.getLong(2) === ga.values.sum, s"n2_a pair ($a,$b)")
      assert(r.getLong(3) === gb.values.sum, s"n2_b pair ($a,$b)")
      assert(r.getLong(4) === o, s"overlap pair ($a,$b)")
      assert(r.getLong(5) ===
        2L * o * 10000L / (ga.values.sum + gb.values.sum),
        s"f1 pair ($a,$b)")
    }
  }
}
