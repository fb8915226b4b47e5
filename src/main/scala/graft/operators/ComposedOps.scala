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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q3_shape" -> q3Shape,
    "tpch_q5_shape" -> q5Shape
  )

  val oracle: Map[String, String] = Map(
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
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
  )
}
