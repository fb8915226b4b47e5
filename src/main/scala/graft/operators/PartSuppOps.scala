package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The five TPC-H shapes that need the `partsupp` table — q2/q9/q11/
  * q16/q20 — completing the 22/22 composite suite (the other 17 live in
  * [[ComposedOps]]).
  *
  * The fixture carries no partsupp parquet, so the table is DERIVED
  * deterministically from `part` × `supplier`: every part gets exactly
  * 4 suppliers at stride max(S/4, 1) around the 0-based supplier-key
  * ring (the classic TPC-H dbgen assignment shape), and availqty /
  * supplycost are integer hash formulas of the key pair. The DuckDB
  * oracles embed the IDENTICAL derivation as a CTE, so both engines
  * compute the same table from the same parquet — all integer
  * arithmetic on non-negative operands, where Spark's truncating DIV
  * and DuckDB's flooring `//` agree.
  *
  * Scale note: partsupp is 4·|part| rows — dimension-like, but it
  * GROWS with SF (0.8 B rows for 200 M parts), so none of these plans
  * broadcast it; it shuffles on its join keys like a fact and only the
  * genuinely bounded sides (nation, region, filtered part slivers,
  * per-nation supplier key lists) are broadcast.
  */
object PartSuppOps extends OpModule {

  /** Derived partsupp: (ps_partkey, ps_suppkey, ps_availqty,
    * ps_supplycost), 4 rows per part, all BIGINT. The supplier count
    * enters as a one-row broadcast cross join — no driver collect.
    */
  def partsupp(s: SparkSession, dir: String): DataFrame = {
    // one-row scalar cross join (the q15/q22 pattern): plans as a
    // 1-row-build BroadcastNestedLoopJoin — constant work per output
    // row at any scale, NOT a data-sized nested loop
    // pair-uniqueness guard: for s_cnt ≥ 4 the stride construction
    // proves (ps_partkey, ps_suppkey) unique (stride·d mod s_cnt ≠ 0
    // for d ∈ 1..3 since 0 < stride·d ≤ 3·⌊s/4⌋ < s); below 4
    // suppliers the ring wraps and duplicate pairs would silently
    // violate the TPC-H key invariant — fail loudly instead.
    // assert_true is NULL on pass, so the filter keeps the row. The
    // guard sits on the ONE-ROW aggregate itself (a no-grouping agg
    // always emits a row, and the broadcast build side materializes
    // unconditionally), so it fires even when the part table is empty —
    // riding the crossJoin output rows would let a <4-supplier fixture
    // pass silently with an empty partsupp.
    val sCnt = Tables.supplier(s, dir).agg(count(lit(1)).as("s_cnt"))
      .filter(assert_true(col("s_cnt") >= 4,
        lit("derived partsupp needs >= 4 suppliers for " +
          "(ps_partkey, ps_suppkey) uniqueness")).isNull)
    Tables.part(s, dir).select(col("p_partkey"))
      .crossJoin(broadcast(sCnt))
      .withColumn("i", explode(sequence(lit(0L), lit(3L))))
      .withColumn("ps_suppkey",
        (col("p_partkey") +
          col("i") * greatest(expr("s_cnt DIV 4"), lit(1L))) % col("s_cnt"))
      .withColumn("ps_availqty",
        (col("p_partkey") * 7 + col("ps_suppkey") * 3) % 9999 + 1)
      .withColumn("ps_supplycost",
        (col("p_partkey") * 31 + col("ps_suppkey") * 17) % 2000 + 1)
      .select(col("p_partkey").as("ps_partkey"), col("ps_suppkey"),
        col("ps_availqty"), col("ps_supplycost"))
  }

  /** The same derivation as DuckDB SQL, prepended to every oracle. */
  private val psCte =
    """partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |         (ps_partkey*7 + ps_suppkey*3) % 9999 + 1 AS ps_availqty,
      |         (ps_partkey*31 + ps_suppkey*17) % 2000 + 1 AS ps_supplycost
      |  FROM (
      |    SELECT p_partkey AS ps_partkey,
      |           (p_partkey + gen.i * GREATEST(sc.s_cnt // 4, 1))
      |             % sc.s_cnt AS ps_suppkey
      |    FROM part
      |    CROSS JOIN (SELECT count(*) AS s_cnt FROM supplier) sc
      |    CROSS JOIN (VALUES (0),(1),(2),(3)) gen(i)
      |  )
      |)""".stripMargin

  /** Q2 shape (minimum-cost supplier): for each small LARGE-type part,
    * the EUROPE supplier(s) offering it at that part's minimum cost.
    * The correlated min-cost subquery is DECORRELATED into
    * aggregate-then-join over the already part-filtered candidate set
    * (the filter is on part attributes only, so the per-part min over
    * EUROPE suppliers is unchanged) — candidates shuffle ONCE on
    * partkey, the region-sliced supplier side joins on suppkey, and
    * the part sliver is an explicit broadcast. Top-100 by account
    * balance lands as TakeOrderedAndProject.
    */
  def q2Shape(s: SparkSession, dir: String): DataFrame = {
    val euroSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir)
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val parts = Tables.part(s, dir)
      .filter(col("p_size") >= 1 && col("p_size") <= 15 &&
        col("p_type") === "LARGE")
      .select(col("p_partkey"), col("p_brand"))
    val cand = partsupp(s, dir)
      .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
      .join(euroSupp, col("ps_suppkey") === col("s_suppkey"))
    val minCost = cand.groupBy(col("ps_partkey").as("mc_pk"))
      .agg(min(col("ps_supplycost")).as("min_cost"))
    cand
      .join(minCost, col("ps_partkey") === col("mc_pk") &&
        col("ps_supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("ps_partkey").as("p_partkey"), col("p_brand"),
        col("ps_supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** Q9 shape (product-type profit): profit by supplier nation and
    * order year over one part-name class — THE multi-fact join tree:
    * lineitem ⋈ partsupp on the COMPOSITE (partkey, suppkey) key is a
    * fact-fact shuffle join (partsupp grows with SF — never broadcast),
    * while the name-filtered part sliver prunes the fact FIRST via a
    * broadcast, and orders/supplier join on their own keys. Profit =
    * revenue − supplycost·quantity in exact DECIMAL, DOUBLE at the
    * edge.
    */
  def q9Shape(s: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(s, dir)
      .filter(col("p_name").contains("red")).select(col("p_partkey"))
    val ps = partsupp(s, dir)
      .join(broadcast(redParts), col("ps_partkey") === col("p_partkey"))
      .select(col("ps_partkey"), col("ps_suppkey"), col("ps_supplycost"))
    Tables.lineitem(s, dir)
      .join(broadcast(redParts.select(col("p_partkey").as("lp_pk"))),
        col("l_partkey") === col("lp_pk"))
      .join(ps, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .withColumn("amount", expr(
        """CAST(l_extendedprice AS DECIMAL(18,2)) *
          | (1 - CAST(l_discount AS DECIMAL(18,2))) -
          | CAST(ps_supplycost AS DECIMAL(18,2)) *
          | CAST(l_quantity AS DECIMAL(18,2))""".stripMargin))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(expr("CAST(SUM(amount) AS DOUBLE)").as("sum_profit"),
        count(lit(1)).as("n_items"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Q11 shape (important stock): per-part inventory value held by one
    * region's suppliers, kept where it exceeds a fraction of the
    * region's total. Value stays in exact BIGINT (integer cost ×
    * qty); the threshold is a one-row broadcast-joined scalar — the
    * group-then-filter runs distributed, no driver collect. The
    * region's supplier-key list is the only broadcast; partsupp
    * shuffles once on suppkey then aggregates on partkey.
    */
  def q11Shape(s: SparkSession, dir: String): DataFrame = {
    val asiaSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir)
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val natPs = partsupp(s, dir)
      .join(broadcast(asiaSupp), col("ps_suppkey") === col("s_suppkey"))
      .withColumn("v", col("ps_supplycost") * col("ps_availqty"))
    // exact and division-free: value·10⁴ > total in BIGINT on both
    // sides (value ≤ ~8·10⁷ per part, so ·10⁴ cannot overflow), so a
    // group landing exactly on the 0.01 % boundary compares identically
    // in both engines — no float threshold to straddle
    val threshold = natPs.agg(sum(col("v")).as("total"))
    natPs.groupBy(col("ps_partkey"))
      .agg(sum(col("v")).as("value"))
      .join(broadcast(threshold))
      .filter(col("value") * lit(10000L) > col("total"))
      .select(col("ps_partkey"), col("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  /** Q16 shape (parts/supplier relationship): how many distinct
    * suppliers can provide each surviving (brand, type, size) class,
    * excluding a deterministic "complaints" supplier set (every 7th
    * key — the fixture has no comment column to grep). The exclusion
    * is a broadcast LEFT ANTI on suppkey; the part sliver broadcasts;
    * the only big shuffle is the count-distinct aggregate.
    */
  def q16Shape(s: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(s, dir)
      .filter(col("s_suppkey") % 7 === 0).select(col("s_suppkey"))
    val parts = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "MEDIUM" &&
        col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size"))
    partsupp(s, dir)
      .join(broadcast(excluded),
        col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Q20 shape (potential part promotion): suppliers in one region
    * holding EXCESS stock of small-class parts — availqty above half of
    * what they actually shipped in a year. The correlated quantity
    * subquery is DECORRELATED into a (partkey, suppkey) aggregate of
    * the date-sliced fact, inner-joined to partsupp (pairs with no
    * shipments drop out, matching the NULL-comparison semantics of the
    * correlated form); the half-threshold compares 2·availqty against
    * the exact DECIMAL quantity sum, division-free. The supplier
    * filter then runs as a LEFT SEMI against the distinct qualifying
    * key set.
    */
  def q20Shape(s: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables.part(s, dir)
      .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
    val shipped = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(expr("CAST(l_quantity AS DECIMAL(18,2))")).as("sum_qty"))
    val qualifying = partsupp(s, dir)
      .join(broadcast(smallParts), col("ps_partkey") === col("p_partkey"))
      .join(shipped, col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey"))
      .filter(expr("CAST(ps_availqty * 2 AS DECIMAL(18,2)) > sum_qty"))
      .select(col("ps_suppkey")).distinct()
    Tables.supplier(s, dir)
      .join(qualifying, col("s_suppkey") === col("ps_suppkey"),
        "left_semi")
      .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir)
            .filter(col("r_name") === "AFRICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q2_shape" -> q2Shape,
    "tpch_q9_shape" -> q9Shape,
    "tpch_q11_shape" -> q11Shape,
    "tpch_q16_shape" -> q16Shape,
    "tpch_q20_shape" -> q20Shape
  )

  val oracle: Map[String, String] = Map(
    "tpch_q2_shape" ->
      s"""WITH $psCte,
        |euro AS (
        |  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal,
        |         s_name, n_name
        |  FROM partsupp
        |  JOIN supplier ON s_suppkey = ps_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  WHERE r_name = 'EUROPE'
        |),
        |cand AS (
        |  SELECT euro.*, p_brand FROM euro
        |  JOIN part ON p_partkey = ps_partkey
        |  WHERE p_size >= 1 AND p_size <= 15 AND p_type = 'LARGE'
        |),
        |mc AS (SELECT ps_partkey AS mc_pk, min(ps_supplycost) AS min_cost
        |       FROM cand GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
        |       p_brand, ps_supplycost
        |FROM cand JOIN mc ON ps_partkey = mc_pk
        |  AND ps_supplycost = min_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "tpch_q9_shape" ->
      s"""WITH $psCte
        |SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (1 - CAST(l_discount AS DECIMAL(18,2))) -
        |       CAST(ps_supplycost AS DECIMAL(18,2)) *
        |       CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_profit,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN partsupp ON ps_partkey = l_partkey
        |  AND ps_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "tpch_q11_shape" ->
      s"""WITH $psCte,
        |natps AS (
        |  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
        |  FROM partsupp
        |  JOIN supplier ON s_suppkey = ps_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  WHERE r_name = 'ASIA'
        |)
        |SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value
        |FROM natps GROUP BY ps_partkey
        |HAVING SUM(v) * 10000 > (SELECT SUM(v) FROM natps)
        |ORDER BY value DESC, ps_partkey""".stripMargin,
    "tpch_q16_shape" ->
      s"""WITH $psCte
        |SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT ps_suppkey) AS BIGINT)
        |         AS supplier_cnt
        |FROM partsupp JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'MEDIUM'
        |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
        |  AND ps_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "tpch_q20_shape" ->
      s"""WITH $psCte,
        |shipped AS (
        |  SELECT l_partkey, l_suppkey,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2
        |),
        |qualifying AS (
        |  SELECT DISTINCT ps_suppkey
        |  FROM partsupp
        |  JOIN part ON p_partkey = ps_partkey
        |  JOIN shipped ON l_partkey = ps_partkey
        |    AND l_suppkey = ps_suppkey
        |  WHERE p_name LIKE 'small%'
        |    AND CAST(ps_availqty * 2 AS DECIMAL(18,2)) > sum_qty
        |)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN region ON r_regionkey = n_regionkey
        |WHERE r_name = 'AFRICA'
        |  AND s_suppkey IN (SELECT ps_suppkey FROM qualifying)
        |ORDER BY s_name""".stripMargin
  )
}
