package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics over relationship graphs *derived from* the
  * fact tables — the missing shape next to the engine's connected-components
  * family (DedupOps.dupClusters): fixed-iteration PageRank with exact
  * integer arithmetic, fully value-oracled.
  *
  * Scale shape: the expensive part is building the edge list — two shuffle
  * joins over the fact table plus a map-side-combined aggregate that
  * collapses everything to ≤ |nodes|² weighted edges. The rank iterations
  * then run on that aggregated edge list with the rank vector BROADCAST
  * each round (|nodes| rows), so each iteration is a broadcast join + one
  * ≤ |nodes|²-row aggregate — no data-volume shuffle ever repeats. At
  * 100 TB the fact scan dominates and happens exactly once
  * (`localCheckpoint` pins the edge list so the unrolled iterations do not
  * re-run the fact joins — the DedupOps.dupClusters lineage-cut pattern).
  */
object GraphOps extends OpModule {

  /** Weighted PageRank (3 iterations, damping 0.85) over the nation-level
    * trade graph: an edge src→dst weighted by how many lineitems customers
    * of nation `src` bought from suppliers of nation `dst`.
    *
    * Parity design — FIXED-POINT micro-units end to end: ranks live in
    * integer micro-units (Σ r₀ = 10⁶), every per-edge contribution is
    * `r·w DIV outw` (exact integer truncation, identical in Spark `DIV`
    * and DuckDB `//` for the non-negative operands here), and the damping
    * update is `6000 + 850000·inflow DIV 10⁶` — no float enters the
    * pipeline, so 3 chained CTEs in DuckDB reproduce every rank bit for
    * bit. Nodes with no in-edges hold the base rank; mass lost to
    * integer-truncation dust and dangling nodes is NOT redistributed
    * (documented invariant — both engines drop it identically).
    */
  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val damping = 850000L // 0.85 in micro-units
    val nIter = 3
    val nation = Tables.nation(s, dir)
    // supplier/nation are dimension-sized at any SF — broadcast; the
    // orders⋈customer and ⋈lineitem joins shuffle on their keys and are
    // immediately collapsed by the (src, dst) aggregate (map-side combine
    // bounds the shuffle at ≤ |nations|² rows per task).
    val liSupp = Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("s_nationkey").as("dst"))
    val ordCust = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey").as("src"))
    val edges = liSupp
      .join(ordCust, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    // ≤ |nations|² rows; pin so the unrolled iterations reuse it instead
    // of re-running the fact joins (lineage cut, context-cleaner managed)
    val e = edges.join(outw, "src").localCheckpoint()

    val nodes = nation.select(col("n_nationkey").as("node"))
    val base = 1000000L / 25 // Σ r₀ = 10⁶ over the 25 nations, exact
    var rank = nodes.withColumn("r", lit(base))
    for (_ <- 1 to nIter) {
      val inflow = e
        .join(broadcast(rank), col("src") === col("node"))
        .select(col("dst"), expr("r * w DIV outw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      rank = nodes
        .join(inflow, col("node") === col("dst"), "left")
        .select(col("node"),
          expr(s"${1000000L - damping} DIV 25 + " +
            s"$damping * coalesce(inflow, CAST(0 AS BIGINT)) DIV 1000000")
            .as("r"))
    }
    rank
      .join(broadcast(nation), col("node") === col("n_nationkey"))
      .select(col("n_nationkey"), col("n_name"), col("r").as("rank_micro"))
      .orderBy(col("n_nationkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> pagerank
  )

  val oracle: Map[String, String] = Map(
    "graph_pagerank" ->
      """WITH edges AS (
        |  SELECT c_nationkey AS src, s_nationkey AS dst,
        |         CAST(count(*) AS BIGINT) AS w
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |e AS (
        |  SELECT edges.*, o.outw
        |  FROM edges JOIN (SELECT src, CAST(sum(w) AS BIGINT) AS outw
        |                   FROM edges GROUP BY 1) o USING (src)),
        |r0 AS (SELECT n_nationkey AS node, CAST(40000 AS BIGINT) AS r
        |       FROM nation),
        |r1 AS (
        |  SELECT r0.node,
        |         CAST(6000 + 850000 * COALESCE(i.s, 0) // 1000000 AS BIGINT)
        |           AS r
        |  FROM r0 LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(r.r * e.w // e.outw) AS BIGINT)
        |      AS s
        |    FROM e JOIN r0 r ON r.node = e.src GROUP BY 1) i
        |  USING (node)),
        |r2 AS (
        |  SELECT r1.node,
        |         CAST(6000 + 850000 * COALESCE(i.s, 0) // 1000000 AS BIGINT)
        |           AS r
        |  FROM r1 LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(r.r * e.w // e.outw) AS BIGINT)
        |      AS s
        |    FROM e JOIN r1 r ON r.node = e.src GROUP BY 1) i
        |  USING (node)),
        |r3 AS (
        |  SELECT r2.node,
        |         CAST(6000 + 850000 * COALESCE(i.s, 0) // 1000000 AS BIGINT)
        |           AS r
        |  FROM r2 LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(r.r * e.w // e.outw) AS BIGINT)
        |      AS s
        |    FROM e JOIN r2 r ON r.node = e.src GROUP BY 1) i
        |  USING (node))
        |SELECT n_nationkey, n_name, r3.r AS rank_micro
        |FROM r3 JOIN nation ON node = n_nationkey
        |ORDER BY n_nationkey""".stripMargin
  )
}
