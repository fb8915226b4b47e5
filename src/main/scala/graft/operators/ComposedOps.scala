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

  /** Q1 shape (pricing summary report): the canonical full-scan aggregate —
    * eight aggregates over two low-cardinality group keys with a date
    * predicate that pushes to the parquet scan. The plan IS the 100 TB
    * plan: partial HashAggregate on every input partition collapses each
    * to ≤ (3×2) rows before the one tiny shuffle, so the exchange carries
    * O(groups × partitions) rows regardless of fact size. Money math in
    * exact DECIMAL (sums are associative, partial-agg-safe), DOUBLE only
    * at the edge; the three averages divide the same exact sum by the
    * same count in both engines, so every double is bit-identical.
    */
  def q1Shape(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)")
          .as("sum_qty"),
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)")
          .as("sum_base_price"),
        expr(
          """CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
            | (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"""
            .stripMargin).as("sum_disc_price"),
        expr(
          """CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
            | (1 - CAST(l_discount AS DECIMAL(18,2))) *
            | (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)"""
            .stripMargin).as("sum_charge"),
        expr(
          """CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            | / COUNT(*)""".stripMargin).as("avg_qty"),
        expr(
          """CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            | / COUNT(*)""".stripMargin).as("avg_price"),
        expr(
          """CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
            | / COUNT(*)""".stripMargin).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q10 shape (returned-item revenue): which customers returned the most
    * merchandise in one quarter. Fact spine lineitem(R-flag)→orders(date
    * window)→customer→nation: both fact filters push to their scans
    * BEFORE the join (the R flag keeps ~1/3 of lineitem, the quarter
    * keeps ~1/8 of orders), the nation dimension is an explicit
    * broadcast, and the customer join is left to size estimation — at
    * 100 TB customers are fact-sized and must shuffle. Top-20 lands as
    * TakeOrderedAndProject.
    */
  def q10Shape(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, dir)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-10-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(expr(revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Q14 shape (promo-class revenue share): one month of lineitem joined
    * to its part, reduced to a single conditional-share row. The month
    * filter pushes to the fact scan; the part side carries only
    * (p_partkey, p_type) after pruning and is explicitly broadcast — at
    * any scale the part dimension is orders of magnitude smaller than
    * the fact, and the share itself needs no shuffle at all beyond the
    * one-row final aggregate. Numerics: both CASE legs sum in exact
    * DECIMAL; the single 100·x/y division happens once in DOUBLE on
    * bit-identical operands.
    */
  def q14Shape(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-03-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-04-01")))
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        expr(
          """CAST(100 * SUM(CASE WHEN p_type = 'ECONOMY'
            |   THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
            |        (1 - CAST(l_discount AS DECIMAL(18,2)))
            |   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
            |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
            |   (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"""
            .stripMargin).as("promo_share"),
        count(lit(1)).as("n_items"))

  /** Q19 shape (disjunctive-predicate join): revenue from three
    * brand/size/quantity bands OR-ed together — the classic test of
    * whether an optimizer can factor a disjunction. The factoring is done
    * the way a 100 TB plan wants it: the predicate's common ENVELOPE
    * (brand ∈ {…} ∧ size ≤ 15 on the part side, quantity ≤ 30 on the
    * fact side) is hoisted conjunctively so both halves push into their
    * parquet scans and the part side shrinks to a broadcastable sliver
    * BEFORE the join; the exact three-way OR (which straddles both
    * tables) stays as the residual filter on the joined rows. No
    * fact-side shuffle at all: scan → broadcast-hash-join → filter →
    * one-row aggregate.
    */
  def q19Shape(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir)
      .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#3") &&
        col("p_size") >= 1 && col("p_size") <= 15)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size") <= 5 &&
          col("l_quantity") <= 11) ||
        (col("p_brand") === "Brand#23" && col("p_size") <= 10 &&
          col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
        (col("p_brand") === "Brand#3" &&
          col("l_quantity") >= 20))
      .agg(expr(revenue).as("revenue"), count(lit(1)).as("n_items"))
  }

  /** Q22 shape (global-sales-opportunity): market segments of well-funded
    * customers gone DORMANT — a scalar subquery (global positive-balance
    * average) feeding an anti join. Q22's literal "never ordered" is
    * vacuous on this fixture (every customer has orders), so the anti
    * side is the customers with an order since 1998-01-01 — same join
    * graph, non-degenerate answer. The scalar is a one-row
    * broadcast-joined aggregate (physically a tiny separate job whose
    * result ships to every partition — no driver collect); the NOT EXISTS
    * is a left-anti hash join of customer against the filtered o_custkey
    * projection (the date filter pushes to the orders scan), which at
    * 100 TB shuffles only the two key columns. The average divides an
    * exact DECIMAL sum by a count, so the threshold is the identical
    * double in both engines and the qualifying row set matches exactly.
    */
  def q22Shape(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(expr(
        """CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
          | / COUNT(*)""".stripMargin).as("avg_bal"))
    cust
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(s, dir)
        .filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01")))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)")
          .as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q4 shape (order-priority checking): orders in one quarter having at
    * least one SLOW lineitem — the fixture carries no commit/receipt
    * dates, so "slow" is a ship date more than 60 days after the order
    * date, which preserves Q4's exact plan shape: an EXISTS whose
    * correlated predicate references BOTH tables (it can't be pushed to
    * either scan alone), planned as a left-semi hash join on orderkey
    * with the cross-table date test as the residual condition. The
    * quarter filter pushes to the orders scan; the aggregate is the tiny
    * 5-row priority census.
    */
  def q4Shape(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-07-01")) &&
        col("o_orderdate") < to_timestamp(lit("1996-10-01")))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** Q6 shape (forecasting revenue change): the canonical scan-filter-
    * aggregate — one year of mid-discount small-quantity lineitems
    * collapsed to a single revenue number. All three predicates push to
    * the parquet scan (row-group statistics prune most of the fact at
    * 100 TB when date-sorted); no join, no shuffle beyond the one-row
    * final aggregate. Revenue = Σ price·discount in exact DECIMAL.
    */
  def q6Shape(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(expr(
        """CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
          | CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)"""
          .stripMargin).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Q7 shape (volume shipping): trade volume between two nations by
    * year, in BOTH directions — supplier nation and customer nation must
    * be the ordered pair (N1,N2) or (N2,N1). The two nation arms are
    * 1-row broadcast slivers joined to supplier/customer BEFORE the
    * fact spine, so the disjunctive pair test collapses to an equi-join
    * residual on two tiny dimension columns; the only shuffles are the
    * fact joins on orderkey/custkey. Volume in exact DECIMAL per
    * (supp_nation, cust_nation, year).
    */
  def q7Shape(s: SparkSession, dir: String): DataFrame = {
    val n1 = "NATION_3"; val n2 = "NATION_7"
    val nations = Tables.nation(s, dir)
      .filter(col("n_name").isin(n1, n2))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(nations.select(col("n_nationkey").as("sk"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(nations.select(col("n_nationkey").as("ck"),
        col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("ck"))
      .select(col("c_custkey"), col("cust_nation"))
    Tables.lineitem(s, dir)
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("o_orderdate")).as("l_year"))
      .agg(expr(revenue).as("volume"), count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q12 shape (shipping-priority audit): per return-flag class (the
    * fixture's stand-in for Q12's ship mode), how many 1997-shipped
    * lineitems belonged to urgent/high-priority orders vs the rest. The
    * classic conditional two-counter aggregate over a fact⋈dimension-
    * projected join: the year filter pushes to the lineitem scan, orders
    * contributes only (orderkey, priority), and the result is the 3-row
    * flag census.
    */
  def q12Shape(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        expr("""SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               | THEN 1 ELSE 0 END)""".stripMargin).as("high_line_count"),
        expr("""SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               | THEN 1 ELSE 0 END)""".stripMargin).as("low_line_count"))
      .orderBy(col("l_returnflag"))

  /** Q13 shape (customer distribution): the histogram of customers by
    * order count — including zero-order customers, which is why the
    * LEFT OUTER join is load-bearing (an inner join silently drops the
    * bucket every churn analysis cares about). Two-level aggregate: the
    * outer join's per-customer count, then the count-of-counts; both
    * aggregates are map-side combinable and the second runs on the
    * ≤|distinct counts| frame.
    */
  def q13Shape(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Q15 shape (top supplier): suppliers achieving the MAXIMUM quarter
    * revenue — the "create view then self-reference" query, here the
    * revenue frame computed once and consumed twice (per-supplier rows +
    * the 1-row max), with the scalar max broadcast back onto the frame
    * (the llm_tfidf pattern; Catalyst additionally reuses the exchange
    * under AQE). Revenue stays exact DECIMAL through BOTH the ranking
    * and the equality test — comparing doubles for the tie set would be
    * the classic Q15 wrong-answer; DOUBLE only in the output column.
    */
  def q15Shape(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-10-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")))
      .groupBy(col("l_suppkey"))
      .agg(expr(
        """SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
          | (1 - CAST(l_discount AS DECIMAL(18,2))))""".stripMargin)
        .as("total_rev"))
    val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.join(broadcast(maxRev))
      .filter(col("total_rev") === col("max_rev"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q4_shape" -> q4Shape,
    "tpch_q6_shape" -> q6Shape,
    "tpch_q7_shape" -> q7Shape,
    "tpch_q12_shape" -> q12Shape,
    "tpch_q13_shape" -> q13Shape,
    "tpch_q15_shape" -> q15Shape,
    "tpch_q1_shape" -> q1Shape,
    "tpch_q10_shape" -> q10Shape,
    "tpch_q14_shape" -> q14Shape,
    "tpch_q19_shape" -> q19Shape,
    "tpch_q22_shape" -> q22Shape,
    "tpch_q3_shape" -> q3Shape,
    "tpch_q5_shape" -> q5Shape,
    "tpch_q8_shape" -> q8Shape,
    "tpch_q17_shape" -> q17Shape,
    "tpch_q18_shape" -> q18Shape,
    "tpch_q21_shape" -> q21Shape
  )

  val oracle: Map[String, String] = Map(
    "tpch_q4_shape" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "tpch_q6_shape" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |         CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "tpch_q7_shape" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       year(o_orderdate) AS l_year,
        |       $revenue AS volume, count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_3', 'NATION_7')
        |  AND n2.n_name IN ('NATION_3', 'NATION_7')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "tpch_q12_shape" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority
        |                       NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "tpch_q13_shape" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
        |                   WHERE o_orderpriority <> '4-NOT SPECIFIED') o
        |    ON c_custkey = o.o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch_q15_shape" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-10-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "tpch_q1_shape" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2))) *
        |    (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q10_shape" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
        |       $revenue AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "tpch_q14_shape" ->
      """SELECT
        |  CAST(100 * SUM(CASE WHEN p_type = 'ECONOMY'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS promo_share,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,
    "tpch_q19_shape" ->
      s"""SELECT $revenue AS revenue, COUNT(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "tpch_q22_shape" ->
      """WITH avg_bal AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |           / COUNT(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, COUNT(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         AS totacctbal
        |FROM customer, avg_bal
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1998-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
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
