package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Window-function operators (SURVEY.md §2b "Window functions").
  *
  * The reference's monotonic `COUNTER` (reference README.md:88) is morally a
  * row_number, and its lost/duplicated-offset analysis (README.md:94–99) is
  * a lag/lead gap check — `win_lag_lead` turns that manual audit into a
  * query.
  *
  * Scale notes: every window here partitions by a high-cardinality key
  * (customer, user, brand) — one hash shuffle on the partition key, then a
  * per-partition sort; no global single-partition window anywhere (that
  * would serialize 100 TB through one task). Running/sliding sums run in
  * DECIMAL (exact) and cast to DOUBLE at the edge for oracle parity.
  */
object WindowOps extends OpModule {

  /** Latest 3 orders per customer — the dedup-rank pattern. */
  def rowNumber(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** rank vs dense_rank with real ties (price-only ordering within brand). */
  def rankDense(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc)
    Tables.part(s, dir)
      .withColumn("price_rank", rank().over(w))
      .withColumn("price_dense", dense_rank().over(w))
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        col("price_rank"), col("price_dense"))
      .orderBy(col("p_partkey"))
  }

  /** Gap detection per user: time to previous/next event — the reference's
    * lost-offset audit (README.md:94–99) as lag/lead.
    */
  def lagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(col("prev_ts")))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("prev_ts"), col("next_ts"), col("gap_us"))
      .orderBy(col("event_id"))
  }

  /** Running total spend per customer (frame: unbounded preceding → current).
    */
  def runningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("running_spend",
        sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).over(w)
          .cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Sliding 3-row average spend per customer. avg is computed as exact
    * DECIMAL sum / count so both engines divide the same two numbers.
    */
  def slidingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("win_sum",
        sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).over(w)
          .cast("double"))
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("sliding_avg", col("win_sum") / col("win_n"))
      .select(col("o_custkey"), col("o_orderkey"), col("sliding_avg"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Time-RANGE frame: trailing-30-day average spend per customer — a
    * value-based frame (all rows within 30 days), not a row-count frame.
    */
  def rangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-30L * 86400, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("t30_sum",
        sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).over(w)
          .cast("double"))
      .withColumn("t30_n", count(lit(1)).over(w))
      .withColumn("trailing_avg", col("t30_sum") / col("t30_n"))
      .select(col("o_custkey"), col("o_orderkey"), col("trailing_avg"),
        col("t30_n"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Distribution functions: quartile bucket, percent_rank, cume_dist of
    * customers by balance within market segment.
    */
  def distribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("c_custkey"))
  }

  /** Value window functions: first/last/nth order value per customer
    * (frame pinned to the whole partition so last_value is the true last).
    */
  def valueFns(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_row_number" -> rowNumber,
    "win_rank_dense" -> rankDense,
    "win_lag_lead" -> lagLead,
    "win_running_sum" -> runningSum,
    "win_sliding_avg" -> slidingAvg,
    "win_range_frame" -> rangeFrame,
    "win_distribution" -> distribution,
    "win_value_fns" -> valueFns
  )

  val oracle: Map[String, String] = Map(
    "win_row_number" ->
      """SELECT o_custkey, rn, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey) rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_rank_dense" ->
      """SELECT p_partkey, p_brand, p_retailprice,
        |       rank() OVER (PARTITION BY p_brand
        |                    ORDER BY p_retailprice DESC) AS price_rank,
        |       dense_rank() OVER (PARTITION BY p_brand
        |                          ORDER BY p_retailprice DESC) AS price_dense
        |FROM part ORDER BY p_partkey""".stripMargin,
    "win_lag_lead" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |       CAST(lag(ts, 1) OVER w AS TIMESTAMP) AS prev_ts,
        |       CAST(lead(ts, 1) OVER w AS TIMESTAMP) AS next_ts,
        |       date_diff('microsecond',
        |                 CAST(lag(ts, 1) OVER w AS TIMESTAMP),
        |                 CAST(ts AS TIMESTAMP)) AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey
        |                  ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_sliding_avg" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |         / (COUNT(*) OVER w) AS sliding_avg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |         / (COUNT(*) OVER w) AS trailing_avg,
        |       COUNT(*) OVER w AS t30_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_value_fns" ->
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_totalprice) OVER w AS first_price,
        |       last_value(o_totalprice) OVER w AS last_price,
        |       nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_distribution" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |       ntile(4) OVER w AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin
  )
}
