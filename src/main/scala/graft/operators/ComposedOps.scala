package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Composite analytics queries (TPC-H Q3/Q5 shapes): multi-join pipelines
  * through the optimizer end-to-end — filter pushdown on three scans, a
  * broadcast/shuffle join mix chosen by size, partial aggregation, and
  * top-k. These exercise Catalyst's join planning the way a real workload
  * does, beyond the single-operator queries.
  *
  * Revenue = SUM(extendedprice · (1 − discount)) in DECIMAL (exact) cast
  * to DOUBLE at the edge — ordering by revenue is then identical in both
  * engines.
  */
object ComposedOps extends OpModule {

  private val revenue =
    """CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      | (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"""
      .stripMargin.replaceAll("\n", "")

  /** Q3 shape: unshipped-revenue top-10 for one market segment. */
  def q3Shape(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      .join(Tables.lineitem(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > to_timestamp(lit("1997-01-01")))
      .groupBy(col("l_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .agg(expr(revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** Q5 shape: revenue by nation for one region and order-date year,
    * with the customer and supplier nation required to match (the classic
    * local-supplier-volume join graph).
    */
  def q5Shape(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).filter(col("r_name") === "ASIA")
      .join(Tables.nation(s, dir),
        col("n_regionkey") === col("r_regionkey"))
      .join(Tables.customer(s, dir),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir),
        col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .join(Tables.lineitem(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(expr(revenue).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** Q18 shape (large-volume customers): orders whose total line quantity
    * exceeds a threshold, with their customer. The heavy lineitem
    * aggregation runs FIRST and its HAVING filter shrinks it to a sliver,
    * so the orders and customer joins build against the filtered
    * aggregate instead of re-joining the fact table — the fact table is
    * scanned once and never re-shuffled for the join. Join strategies are
    * deliberately left to size estimation/AQE: the qualifying-order set
    * and the customer dimension both grow with SF, so a forced broadcast
    * would be a 100 TB footgun. Top-100 by total price lands as
    * TakeOrderedAndProject. Quantity sums in exact DECIMAL, DOUBLE only
    * at the edge (the HAVING compares the same cast value in both
    * engines).
    */
  def q18Shape(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)")
        .as("sum_qty"))
      .filter(col("sum_qty") > 250)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"),
        col("o_orderkey"))
      .limit(100)
  }

  /** Q8 shape: a nation's market share per order-year — a TWO-LEVEL join
    * tree (fact spine lineitem→orders→customer plus two dimension arms:
    * part filter, supplier→nation) with a conditional-share aggregate.
    * All four dimension arms are explicitly broadcast (nation/region are
    * tiny; the filtered part slice is small even at 100 TB because the
    * filter lands before the join); the only shuffles left are the two
    * fact-fact joins and the final year aggregate. Numerics: volume in
    * exact DECIMAL, one double division at the very edge — both engines
    * divide bit-identical sums.
    */
  def q8Shape(s: SparkSession, dir: String): DataFrame = {
    val custNations = Tables.nation(s, dir)
      .join(Tables.region(s, dir).filter(col("r_name") === "AMERICA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val suppNations = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))
    val parts = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    Tables.lineitem(s, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNations), col("c_nationkey") === col("cn_key"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNations), col("s_nationkey") === col("sn_key"))
      .withColumn("o_year", year(col("o_orderdate")))
      .withColumn("volume", expr(
        """CAST(l_extendedprice AS DECIMAL(18,2)) *
          | (1 - CAST(l_discount AS DECIMAL(18,2)))""".stripMargin))
      .groupBy(col("o_year"))
      .agg(
        expr(
          """CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
            |          THEN volume ELSE 0 END) AS DOUBLE) /
            | CAST(SUM(volume) AS DOUBLE)""".stripMargin).as("mkt_share"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_year"))
  }

  /** Q17 shape: revenue from small-quantity orders, i.e. lineitems under
    * 20% of their part's average quantity, per brand. The correlated
    * scalar subquery is DECORRELATED by hand into aggregate-then-join —
    * the per-part stats table shuffles once on partkey and joins the fact
    * on the same key (no row explosion, no re-aggregation per outer row,
    * the only form that scales). The threshold predicate is division-free:
    * qty < 0.2·avg  ⟺  5·qty·cnt < sum, kept in exact DECIMAL so both
    * engines pick the identical row set.
    */
  def q17Shape(s: SparkSession, dir: String): DataFrame = {
    val stats = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("agg_pk"))
      .agg(sum(expr("CAST(l_quantity AS DECIMAL(18,2))")).as("sum_qty"),
        count(lit(1)).as("cnt_qty"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .join(stats, col("l_partkey") === col("agg_pk"))
      .filter(expr(
        "CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt_qty < sum_qty"))
      .groupBy(col("p_brand"))
      .agg(
        expr("""CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
               | AS DOUBLE) / 7.0""".stripMargin).as("avg_yearly"),
        count(lit(1)).as("n_small"))
      .orderBy(col("p_brand"))
  }

  /** Q21 shape (suppliers who kept orders waiting): the hardest TPC-H
    * optimizer shape — a multi-way SEMI + ANTI self-join of the fact
    * table. A lineitem is "late" past a fixed ship-date cutoff (this
    * fixture carries no receipt/commit dates; the cutoff preserves Q21's
    * exact join graph — a per-row late flag consistent across all three
    * lineitem roles). Keep a late l1 of a finished order iff some OTHER
    * supplier contributed to the same order (EXISTS → left-semi) and no
    * OTHER supplier was ALSO late on it (NOT EXISTS → left-anti), then
    * count per supplier for a nation slice.
    *
    * Scale shape: all three lineitem roles hash-partition on
    * `l_orderkey` — the semi and anti are shuffled hash/sort-merge joins
    * on that one key with the `<>` supplier test as a residual join
    * condition, never a cartesian; the `late` filter prunes l1 AND l3
    * before either self-join; the orders F-filter pushes to its scan and
    * joins on the same orderkey partitioning; the supplier dimension
    * joins once on suppkey after the fact side has collapsed to
    * (orderkey, suppkey) survivors; the 3-row nation slice is an
    * explicit broadcast. Top-100 lands as TakeOrderedAndProject.
    * PlanAuditSpec asserts the semi/anti/no-cartesian plan.
    */
  def q21Shape(s: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1997-09-30"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val l1 = li.filter(col("l_shipdate") > cutoff)
    val l2 = li.select(col("l_orderkey").as("l2_orderkey"),
      col("l_suppkey").as("l2_suppkey"))
    val l3 = l1.select(col("l_orderkey").as("l3_orderkey"),
      col("l_suppkey").as("l3_suppkey"))
    val nations = Tables.nation(s, dir)
      .filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_11"))
      .select(col("n_nationkey"))
    l1
      .join(l2, col("l2_orderkey") === col("l_orderkey") &&
        col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
      .join(l3, col("l3_orderkey") === col("l_orderkey") &&
        col("l3_suppkey") =!= col("l_suppkey"), "left_anti")
      .join(Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(s, dir),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q3_shape" -> q3Shape,
    "tpch_q5_shape" -> q5Shape,
    "tpch_q8_shape" -> q8Shape,
    "tpch_q17_shape" -> q17Shape,
    "tpch_q18_shape" -> q18Shape,
    "tpch_q21_shape" -> q21Shape
  )

  val oracle: Map[String, String] = Map(
    "tpch_q21_shape" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey,
        |         l_shipdate > TIMESTAMP '1997-09-30' AS is_late
        |  FROM lineitem)
        |SELECT s_name, count(*) AS numwait
        |FROM supplier, late l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.is_late
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.is_late)
        |  AND s_nationkey = n_nationkey
        |  AND n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "tpch_q3_shape" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       $revenue AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "tpch_q5_shape" ->
      s"""SELECT n_name, $revenue AS revenue, count(*) AS n_items
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |              AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "tpch_q18_shape" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |           AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       sum_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |WHERE sum_qty > 250
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,
    "tpch_q8_shape" ->
      """SELECT CAST(o_year AS INT) AS o_year,
        |       CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
        |                 THEN volume ELSE 0 END) AS DOUBLE) /
        |         CAST(SUM(volume) AS DOUBLE) AS mkt_share,
        |       count(*) AS n_items
        |FROM (
        |  SELECT year(o_orderdate) AS o_year,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
        |         n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY')
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "tpch_q17_shape" ->
      """WITH stats AS (
        |  SELECT l_partkey AS agg_pk,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |         count(*) AS cnt_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT p_brand,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |         AS DOUBLE) / 7.0 AS avg_yearly,
        |       count(*) AS n_small
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN stats ON l_partkey = agg_pk
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt_qty < sum_qty
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin
  )
}
