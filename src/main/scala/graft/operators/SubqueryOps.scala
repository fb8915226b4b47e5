package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Subquery surface, exercised through `spark.sql` on registered views so
  * Catalyst's actual subquery machinery runs: correlated scalar subqueries
  * (RewriteCorrelatedScalarSubquery decorrelates to an aggregate+join),
  * uncorrelated scalar subqueries (one-row broadcast), and IN-subqueries
  * (planned as left-semi joins). SURVEY.md §4: these rewrites come free
  * from Catalyst — this module proves them on the engine's tables.
  */
object SubqueryOps extends OpModule {

  /** Register dir-scoped views and return the name suffix — idempotent
    * per fixture, so concurrent builders on one session can't cross-read
    * each other's tables through the session-global temp catalog
    * ([[graft.Tables.dirTag]]: hex, never a negative/colliding hashCode).
    */
  private def views(s: SparkSession, dir: String): String = {
    val tag = Tables.dirTag(dir)
    Tables.customer(s, dir).createOrReplaceTempView(s"customer_v_$tag")
    Tables.orders(s, dir).createOrReplaceTempView(s"orders_v_$tag")
    tag
  }

  /** Customers above their own nation's average balance (correlated
    * scalar subquery → decorrelated join).
    */
  def correlatedScalar(s: SparkSession, dir: String): DataFrame = {
    val t = views(s, dir)
    s.sql(
      s"""SELECT c_custkey, c_acctbal FROM customer_v_$t c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer_v_$t c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Orders above the global average price (uncorrelated scalar subquery —
    * evaluated once, broadcast into the filter).
    */
  def uncorrelatedScalar(s: SparkSession, dir: String): DataFrame = {
    val t = views(s, dir)
    s.sql(
      s"""SELECT o_orderkey, o_totalprice FROM orders_v_$t
        |WHERE o_totalprice > 1.5 *
        |  (SELECT avg(o_totalprice) FROM orders_v_$t)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** IN-subquery → left-semi join. */
  def inSubquery(s: SparkSession, dir: String): DataFrame = {
    val t = views(s, dir)
    s.sql(
      s"""SELECT o_orderkey, o_custkey FROM orders_v_$t
        |WHERE o_custkey IN (SELECT c_custkey FROM customer_v_$t
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Correlated EXISTS + NOT EXISTS in one predicate — the two remaining
    * subquery rewrite paths (EXISTS → left-semi, NOT EXISTS → left-anti,
    * both decorrelated by RewritePredicateSubquery). Customers with a
    * finished order but no open one: both probes hit the same orders
    * table, and at scale both plan as hash joins on the correlation key —
    * never a per-row re-execution.
    */
  def existsSubquery(s: SparkSession, dir: String): DataFrame = {
    val t = views(s, dir)
    s.sql(
      s"""SELECT c_custkey, c_name FROM customer_v_$t c
        |WHERE EXISTS (SELECT 1 FROM orders_v_$t o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders_v_$t o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "subquery_correlated" -> correlatedScalar,
    "subquery_scalar" -> uncorrelatedScalar,
    "subquery_in" -> inSubquery,
    "subquery_exists" -> existsSubquery
  )

  val oracle: Map[String, String] = Map(
    "subquery_correlated" ->
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    "subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "subquery_in" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "subquery_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin
  )
}
