package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Sort/limit/top-k and set operations (SURVEY.md §2b).
  *
  * Scale notes:
  *  - `sort_limit_topk` compiles to TakeOrderedAndProject: each task keeps
  *    only its local top-N, the driver merges N×partitions rows — never a
  *    global sort of the full table.
  *  - `topk_per_group` shuffles once on the group key; AQE handles skew.
  *  - Distinct set ops are hash aggregates on the projected key — the
  *    shuffle carries distinct keys only.
  */
object SortSetOps extends OpModule {

  /** Global top-100 orders by price — TakeOrderedAndProject, not a sort. */
  def sortLimitTopk(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** Top-3 orders per customer via rank-and-filter. */
  def topkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** The same top-3-per-customer answer through the NATIVE bounded-heap
    * operator ([[graft.plans.TopKPerGroup]]: custom logical node →
    * planner strategy → partial+final physical exec). The partial pass
    * caps the exchange at k·groups·partitions rows and the final pass
    * never sorts a whole group — vs [[topkPerGroup]]'s window form,
    * which shuffles EVERY order row and full-sorts each customer's
    * orders at the reducer; at 100 TB with hot customers, that is the
    * operator's reason to exist. The rank column is attached AFTER the
    * top-k (a window over the already-k-bounded result — ≤ 3 rows per
    * customer reach it), so the query shares [[topkPerGroup]]'s oracle
    * SQL verbatim and the driver certifies native ≡ window value-for-
    * value. Plan shape + randomized equivalence: TopKPerGroupSpec.
    */
  def topkPerGroupNative(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val top = graft.plans.TopKPerGroup(base, Seq("o_custkey"),
      "o_totalprice", descending = true, "o_orderkey", 3)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    top.withColumn("rn", row_number().over(w))
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private def custSide(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(lit("cust").as("src"),
      col("c_nationkey").as("nkey"), col("c_custkey").as("id"))
  private def suppSide(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir).select(lit("supp").as("src"),
      col("s_nationkey").as("nkey"), col("s_suppkey").as("id"))

  /** Bag union: customers and suppliers as one keyed entity stream. */
  def unionAll(s: SparkSession, dir: String): DataFrame =
    custSide(s, dir).unionByName(suppSide(s, dir))
      .orderBy(col("src"), col("id"))

  /** Distinct union of the nation keys present on either side. */
  def unionDistinct(s: SparkSession, dir: String): DataFrame =
    custSide(s, dir).select(col("nkey"))
      .union(suppSide(s, dir).select(col("nkey")))
      .distinct()
      .orderBy(col("nkey"))

  /** Nations having BOTH customers and suppliers. */
  def intersectKeys(s: SparkSession, dir: String): DataFrame =
    custSide(s, dir).select(col("nkey"))
      .intersect(suppSide(s, dir).select(col("nkey")))
      .orderBy(col("nkey"))

  /** Nations having customers but no high-balance (>6000) supplier — the
    * filter keeps the subtracted side proper so the difference is non-empty.
    */
  def exceptKeys(s: SparkSession, dir: String): DataFrame =
    custSide(s, dir).select(col("nkey"))
      .except(Tables.supplier(s, dir)
        .filter(col("s_acctbal") > 6000)
        .select(col("s_nationkey").as("nkey")))
      .orderBy(col("nkey"))

  /** BAG-semantics difference (`EXCEPT ALL`): each nation key keeps its
    * customer multiplicity MINUS its supplier multiplicity — the form
    * reconciliation queries need ("how many more entities on side A per
    * key?"), which the distinct [[exceptKeys]] collapses to existence.
    * Spark plans both ALL variants as hash joins over (row, multiplicity)
    * counts — map-side partial aggregation bounds the shuffle at the
    * distinct-row count, never the bag size.
    */
  def exceptAllKeys(s: SparkSession, dir: String): DataFrame =
    custSide(s, dir).select(col("nkey"))
      .exceptAll(suppSide(s, dir).select(col("nkey")))
      .orderBy(col("nkey"))

  /** BAG-semantics intersection (`INTERSECT ALL`): each nation key
    * survives min(customer multiplicity, supplier multiplicity) times.
    */
  def intersectAllKeys(s: SparkSession, dir: String): DataFrame =
    custSide(s, dir).select(col("nkey"))
      .intersectAll(suppSide(s, dir).select(col("nkey")))
      .orderBy(col("nkey"))

  /** Exact row dedup on a projection (deterministic, unlike
    * dropDuplicates-keep-first which is order-dependent).
    */
  def dedupDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), col("user_id"))
      .distinct()
      .orderBy(col("event_type"), col("user_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_limit_topk" -> sortLimitTopk,
    "topk_per_group" -> topkPerGroup,
    "topk_per_group_native" -> topkPerGroupNative,
    "set_union_all" -> unionAll,
    "set_union_distinct" -> unionDistinct,
    "set_intersect" -> intersectKeys,
    "set_except" -> exceptKeys,
    "set_except_all" -> exceptAllKeys,
    "set_intersect_all" -> intersectAllKeys,
    "dedup_distinct" -> dedupDistinct
  )

  val oracle: Map[String, String] = Map(
    "sort_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    // identical answer contract as topk_per_group — the native operator
    // must reproduce the window form value-for-value
    "topk_per_group_native" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "set_union_all" ->
      """SELECT 'cust' AS src, c_nationkey AS nkey, c_custkey AS id FROM customer
        |UNION ALL
        |SELECT 'supp' AS src, s_nationkey AS nkey, s_suppkey AS id FROM supplier
        |ORDER BY src, id""".stripMargin,
    "set_union_distinct" ->
      """SELECT c_nationkey AS nkey FROM customer
        |UNION
        |SELECT s_nationkey AS nkey FROM supplier
        |ORDER BY nkey""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nkey FROM supplier
        |ORDER BY nkey""".stripMargin,
    "set_except" ->
      """SELECT c_nationkey AS nkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nkey FROM supplier WHERE s_acctbal > 6000
        |ORDER BY nkey""".stripMargin,
    "dedup_distinct" ->
      """SELECT DISTINCT event_type, user_id FROM events
        |ORDER BY event_type, user_id""".stripMargin,
    "set_except_all" ->
      """SELECT c_nationkey AS nkey FROM customer
        |EXCEPT ALL
        |SELECT s_nationkey AS nkey FROM supplier
        |ORDER BY nkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT c_nationkey AS nkey FROM customer
        |INTERSECT ALL
        |SELECT s_nationkey AS nkey FROM supplier
        |ORDER BY nkey""".stripMargin
  )
}
