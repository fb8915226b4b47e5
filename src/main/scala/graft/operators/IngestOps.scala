package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Batch twins of the reference's ingestion/delivery semantics.
  *
  * The reference (Andyyh2005/DataIngestionToHANA, README.md:132–164) builds
  * exactly-once delivery out of at-least-once redelivery + an idempotent
  * UPSERT keyed on a producer-minted id (`PRIMARY KEY (counter)`,
  * README.md:144–146). The engine-internal, oracle-checkable form of that
  * UPSERT is dedup-last-wins-by-key: for each key keep the newest row, which
  * is precisely what a stream of upserts leaves behind in the table.
  *
  * Scale notes: `row_number() over (partition by key)` is a single hash
  * shuffle on the key — the same exchange a groupBy would pay, no extra
  * pass. At 100 TB the key (event_id) is high-cardinality and uniform, so
  * the shuffle partitions evenly; AQE coalesces small partitions. No
  * collect, no driver state.
  */
object IngestOps extends OpModule {

  /** Flagship: replayed-stream table → UPSERT-by-PK semantics → per-type
    * rollup. Mirrors reference README.md:135–139 (UPSERT keyed on counter)
    * with `events.event_id` as the producer-minted key.
    */
  def exactlyOnceUpsert(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    // Last-wins by event_id: ties broken on value so the winner is total-
    // ordered (determinism rule, SURVEY.md §2b).
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("ts").desc, col("value").desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        // Exact, shuffle-order-independent double aggregate: sum in
        // DECIMAL(18,2) then cast back (the repo-wide parity pattern).
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .orderBy(col("event_type"))
  }

  val oracle: Map[String, String] = Map(
    "exactly_once_upsert" ->
      """WITH dedup AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY event_id ORDER BY ts DESC, value DESC) AS rn
        |    FROM events) t
        |  WHERE rn = 1)
        |SELECT event_type, count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM dedup GROUP BY event_type ORDER BY event_type""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "exactly_once_upsert" -> exactlyOnceUpsert
  )
}
