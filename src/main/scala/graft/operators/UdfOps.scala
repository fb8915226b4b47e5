package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator

import graft.Tables

/** User-defined function surface (SURVEY.md §2b "UDF/UDAF/UDTF").
  *
  * The reference's extension points are its two JavaScript script operators:
  * a per-message scalar callback (reference README.md:31–43, the
  * "Processing Data" pass-through/transform) and a stateful per-stream
  * callback (README.md:47–63). Spark-side: a registered Scala UDF for the
  * scalar case, a typed `Aggregator` for the stateful case, and
  * explode/flatMap as the generator (UDTF) case.
  *
  * `udaf_typed` reproduces the reference's offset-range ledger — the
  * min/max/count per group that its golden tables (README.md:94–97,
  * 121–124, 159–162) are built from, including the gap flag that catches
  * the at-most-once loss.
  *
  * Scale notes: the UDF is a narrow map (no shuffle); the Aggregator gets
  * map-side partial aggregation via reduce/merge exactly like a built-in;
  * the explode fans out ~#tokens rows per doc but feeds straight into a
  * partial-aggregated count.
  */
object UdfOps extends OpModule {

  /** Offset-range tracker: the reference's per-group delivery ledger. */
  case class OffsetRange(min_id: Long, max_id: Long, n: Long)

  object OffsetRangeAgg extends Aggregator[Long, OffsetRange, OffsetRange] {
    def zero: OffsetRange = OffsetRange(Long.MaxValue, Long.MinValue, 0L)
    def reduce(b: OffsetRange, id: Long): OffsetRange =
      OffsetRange(math.min(b.min_id, id), math.max(b.max_id, id), b.n + 1)
    def merge(x: OffsetRange, y: OffsetRange): OffsetRange =
      OffsetRange(math.min(x.min_id, y.min_id),
        math.max(x.max_id, y.max_id), x.n + y.n)
    def finish(r: OffsetRange): OffsetRange = r
    def bufferEncoder: Encoder[OffsetRange] = Encoders.product[OffsetRange]
    def outputEncoder: Encoder[OffsetRange] = Encoders.product[OffsetRange]
  }

  /** Scalar Scala UDF: mint the commit token `topic/partition/offset`
    * (reference images/wiretapAtMostOnce.png) — the "user script per
    * message" capability of the Processing Data operator.
    */
  def udfScalar(s: SparkSession, dir: String): DataFrame = {
    val mintToken =
      udf((topic: String, part: Long, off: Long) => s"$topic/$part/$off")
    Tables.events(s, dir)
      .select(
        col("event_id"),
        mintToken(col("event_type"), col("user_id") % 4, col("event_id"))
          .as("commit_token"))
      .orderBy(col("event_id"))
  }

  /** Typed Aggregator over each user's event-id stream: the offset ledger
    * plus a contiguity flag (has_gap ⇔ ids are not a dense range — the
    * reference's lost-message symptom, README.md:94–99).
    */
  def udafTyped(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(udaf(OffsetRangeAgg, Encoders.scalaLong)(col("event_id"))
        .as("r"))
      .select(
        col("user_id"),
        col("r.min_id").as("min_id"),
        col("r.max_id").as("max_id"),
        col("r.n").as("n"),
        (col("r.max_id") - col("r.min_id") + 1 =!= col("r.n"))
          .as("has_gap"))
      .orderBy(col("user_id"))

  /** Generator (UDTF-shaped): tokenize documents into one row per token,
    * then count — `explode` is Spark's native table-generating function.
    */
  def udtfExplode(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("token"))

  /** Typed cogroup: per customer, walk the customer row and its orders as
    * iterators (KeyValueGroupedDataset.cogroup — the typed-API form of a
    * per-key merge). Aggregates are order-insensitive (count/max) because
    * cogroup iterator order is not defined.
    */
  def typedCogroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // explicit casts at the typed boundary: `.as[(Long, Double)]` only
    // UP-casts, so a fixture shipping these money columns as DECIMAL
    // (the 100× stress star's `x / 100.0` decimal-literal arithmetic)
    // would refuse with CANNOT_UP_CAST — a typed pipeline owns its
    // boundary schema instead of assuming the file's
    val customers = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
    val orders = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_totalprice").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
    customers.cogroup(orders) { (key, cust, ords) =>
      val bal = cust.map(_._2).foldLeft(Double.MinValue)(math.max)
      var n = 0L
      var maxPrice = Double.MinValue
      ords.foreach { o => n += 1; maxPrice = math.max(maxPrice, o._2) }
      if (bal == Double.MinValue) Iterator.empty // order w/o customer: none
      else Iterator((key, bal, n,
        if (n == 0) None else Some(maxPrice)))
    }.toDF("c_custkey", "c_acctbal", "n_orders", "max_price")
      .orderBy(col("c_custkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "udf_scalar" -> udfScalar,
    "udaf_typed" -> udafTyped,
    "udtf_explode" -> udtfExplode,
    "typed_cogroup" -> typedCogroup
  )

  val oracle: Map[String, String] = Map(
    "udf_scalar" ->
      """SELECT event_id,
        |       event_type || '/' || (user_id % 4) || '/' || event_id
        |         AS commit_token
        |FROM events ORDER BY event_id""".stripMargin,
    "udaf_typed" ->
      """SELECT user_id, min(event_id) AS min_id, max(event_id) AS max_id,
        |       count(*) AS n,
        |       (max(event_id) - min(event_id) + 1) != count(*) AS has_gap
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "udtf_explode" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY token""".stripMargin,
    "typed_cogroup" ->
      """SELECT c_custkey, c_acctbal,
        |       (SELECT count(*) FROM orders
        |        WHERE o_custkey = c_custkey) AS n_orders,
        |       (SELECT max(o_totalprice) FROM orders
        |        WHERE o_custkey = c_custkey) AS max_price
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
