package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Reshape operators: pivot (long → wide) and unpivot/melt (wide → long).
  *
  * Scale notes: pivot with an EXPLICIT value list compiles to a single
  * hash aggregate with one conditional aggregate per pivot value — no
  * second pass to discover values (an implicit pivot runs a distinct scan
  * first, which at 100 TB is a full extra job). Unpivot is a generate-side
  * projection (k output rows per input row), no shuffle.
  */
object ReshapeOps extends OpModule {

  private val types = Seq("click", "error", "purchase", "signup", "view")

  /** Events per user pivoted to one column per event type. Counts are
    * coalesced to 0 (pivot yields null for absent combinations; the
    * SQL-twin FILTER form yields 0 — 0 is the honest value).
    */
  def pivotTypes(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .count()
      .select(col("user_id") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("user_id"))

  /** Lineitem measures melted to (measure, value) long format. */
  def unpivotMeasures(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "reshape_pivot" -> pivotTypes,
    "reshape_unpivot" -> unpivotMeasures
  )

  val oracle: Map[String, String] = Map(
    "reshape_pivot" ->
      """SELECT user_id,
        |       count(*) FILTER (event_type = 'click') AS click,
        |       count(*) FILTER (event_type = 'error') AS error,
        |       count(*) FILTER (event_type = 'purchase') AS purchase,
        |       count(*) FILTER (event_type = 'signup') AS signup,
        |       count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "reshape_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |         l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem) t
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin
  )
}
