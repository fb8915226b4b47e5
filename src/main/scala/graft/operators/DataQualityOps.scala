package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality operators — the validation pass a training-data pipeline
  * runs before ingestion (and the engine-grade version of the reference's
  * manual golden-table audits, README.md:94–99: counting losses and
  * duplicates IS a data-quality check).
  *
  * Scale notes: `dq_profile` computes every column statistic in ONE scan
  * (a single aggregate row of many expressions — not one job per column);
  * `dq_constraints` is three aggregates over two scans, with the FK probe
  * as a broadcast-able anti join.
  */
object DataQualityOps extends OpModule {

  /** Single-pass profile of lineitem: volume, null counts, distincts,
    * ranges. The unpivoted output shape (one row per metric) keeps the
    * schema stable as metrics are added.
    */
  def profile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val one = li.agg(
      count(lit(1)).as("row_count"),
      countDistinct(col("l_orderkey")).as("distinct_orders"),
      countDistinct(col("l_partkey")).as("distinct_parts"),
      sum(when(col("l_quantity").isNull, 1L).otherwise(0L))
        .as("null_quantity"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L))
        .as("null_shipdate"),
      expr("CAST(min(l_quantity) AS DOUBLE)").as("min_quantity"),
      expr("CAST(max(l_quantity) AS DOUBLE)").as("max_quantity"))
    one.unpivot(
      Array.empty[org.apache.spark.sql.Column],
      one.columns.map(c => col(c).cast("double")),
      "metric", "value")
      .orderBy(col("metric"))
  }

  /** Constraint violations, one row per rule: key uniqueness, FK
    * coverage, domain bounds. All zeros on healthy data — the point is
    * that the ENGINE proves it, not the generator.
    */
  def constraints(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val orders = Tables.orders(s, dir)
    val dupKeys = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .agg(count(lit(1)).as("violations"))
      .withColumn("rule", lit("pk_unique_orderkey_linenumber"))
    val orphans = li.join(orders,
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .withColumn("rule", lit("fk_lineitem_orders"))
    val domain = li.filter(col("l_quantity") <= 0 ||
        col("l_discount") < 0 || col("l_discount") > 1)
      .agg(count(lit(1)).as("violations"))
      .withColumn("rule", lit("domain_quantity_discount"))
    dupKeys.unionByName(orphans).unionByName(domain)
      .select(col("rule"), col("violations"))
      .orderBy(col("rule"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_profile" -> profile,
    "dq_constraints" -> constraints
  )

  val oracle: Map[String, String] = Map(
    "dq_profile" ->
      """WITH one AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS row_count,
        |         CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS distinct_orders,
        |         CAST(count(DISTINCT l_partkey) AS DOUBLE) AS distinct_parts,
        |         CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
        |              AS DOUBLE) AS null_quantity,
        |         CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |              AS DOUBLE) AS null_shipdate,
        |         CAST(min(l_quantity) AS DOUBLE) AS min_quantity,
        |         CAST(max(l_quantity) AS DOUBLE) AS max_quantity
        |  FROM lineitem)
        |SELECT metric, value FROM (
        |  SELECT 'row_count' AS metric, row_count AS value FROM one
        |  UNION ALL SELECT 'distinct_orders', distinct_orders FROM one
        |  UNION ALL SELECT 'distinct_parts', distinct_parts FROM one
        |  UNION ALL SELECT 'null_quantity', null_quantity FROM one
        |  UNION ALL SELECT 'null_shipdate', null_shipdate FROM one
        |  UNION ALL SELECT 'min_quantity', min_quantity FROM one
        |  UNION ALL SELECT 'max_quantity', max_quantity FROM one) t
        |ORDER BY metric""".stripMargin,
    "dq_constraints" ->
      """SELECT rule, violations FROM (
        |  SELECT 'pk_unique_orderkey_linenumber' AS rule,
        |         (SELECT count(*) FROM (
        |            SELECT 1 FROM lineitem
        |            GROUP BY l_orderkey, l_linenumber
        |            HAVING count(*) > 1)) AS violations
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders',
        |         (SELECT count(*) FROM lineitem
        |          WHERE NOT EXISTS (SELECT 1 FROM orders
        |                            WHERE o_orderkey = l_orderkey))
        |  UNION ALL
        |  SELECT 'domain_quantity_discount',
        |         (SELECT count(*) FROM lineitem
        |          WHERE l_quantity <= 0 OR l_discount < 0 OR l_discount > 1)
        |) t ORDER BY rule""".stripMargin
  )
}
