package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Round-8 additions: chain-robust connected components (pointer-jump),
  * plus specs for the operators added this round.
  */
class Round8OpsSpec extends SparkSpec {

  test("clustersFromEdges: >20-diameter chain converges (pointer-jump)") {
    import spark.implicits._
    // A 60-node path graph (diameter 59) would need 59 rounds under pure
    // min-label propagation — far past the 20-round cap. The pointer-jump
    // makes rounds O(log diameter), so this must converge, and the loud
    // require guarantees it can never silently mislabel instead.
    val edges = (0L until 59L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val rows = DedupOps.clustersFromEdges(edges).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Boolean]("keeper"))).toMap
    assert(rows.keySet === (0L to 59L).toSet)
    (0L to 59L).foreach { v =>
      assert(rows(v) === (0L, 60L, v == 0L), s"v=$v")
    }
  }

  test("llm_bpe_train: greedy re-merge and exhaustion on a known corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    // "x y x y x y": round 1 merges (x,y) n=3 → "xy xy xy"; round 2
    // merges (xy,xy) n=2 GREEDILY (first pair wins, middle token is
    // consumed) → "xyxy xy"; round 3 merges (xyxy,xy) n=1 → one token;
    // round 4 finds no adjacent pair and the trainer stops early.
    Seq((0L, "x y x y x y", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.bpeTrain(spark, dir).collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("a"),
        r.getAs[String]("b"), r.getAs[String]("merge_token"),
        r.getAs[Long]("n")))
    assert(got.toSeq === Seq(
      (1, "x", "y", "xy", 3L),
      (2, "xy", "xy", "xyxy", 2L),
      (3, "xyxy", "xy", "xyxyxy", 1L)))
  }

  test("llm_bpe_train: fixture run is ranked, consistent with the census") {
    val merges = graft.operators.TextOps.bpeTrain(spark, sf0001).collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("a"),
        r.getAs[String]("b"), r.getAs[Long]("n")))
    assert(merges.map(_._1).toSeq === (1 to merges.length))
    // merge counts never increase round-over-round: merging only removes
    // occurrences of other pairs, and any NEW pair contains the merged
    // token so its count is bounded by the winning count
    merges.sliding(2).foreach {
      case Array(a, b) => assert(a._4 >= b._4, s"$a then $b")
      case _ => ()
    }
    // round 1 must agree with the standalone pair census's top-1
    val top = graft.operators.TextOps.bpePairs(spark, sf0001)
      .limit(1).collect()(0)
    assert((merges(0)._2, merges(0)._3, merges(0)._4) ===
      (top.getAs[String]("a"), top.getAs[String]("b"),
        top.getAs[Long]("n")))
  }

  test("clustersFromEdges: two long chains + a clique stay separate") {
    import spark.implicits._
    val chainA = (0L until 30L).map(i => (i, i + 1))
    val chainB = (100L until 125L).map(i => (i, i + 1))
    val clique = Seq((200L, 201L), (201L, 202L), (200L, 202L))
    val rows = DedupOps.clustersFromEdges(
      (chainA ++ chainB ++ clique).toDF("doc_a", "doc_b")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    (0L to 30L).foreach(v => assert(rows(v) === 0L))
    (100L to 125L).foreach(v => assert(rows(v) === 100L))
    (200L to 202L).foreach(v => assert(rows(v) === 200L))
  }
}
