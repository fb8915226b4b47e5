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

  /** Dead-letter-queue split: serialize each event to its CSV message
    * body (the reference's wire format), deterministically corrupt a
    * known subset — every 97th counter loses its trailing fields, every
    * 101st carries a non-numeric reading — then parse with `from_csv`
    * (PERMISSIVE) and classify each message off the PARSE RESULT into
    * ok / dead-letter-truncated / dead-letter-bad-type. This is the
    * malformed-message routing an ingestion pipeline must do before the
    * HANA sink (the reference's Simulate Error operator motivates the
    * failure path, README.md:10); the DuckDB oracle classifies the same
    * rows purely from the counter arithmetic — two independent routes
    * that must agree row-for-row, which proves the parser-based
    * classification exact.
    *
    * Scale shape: fully narrow (serialize → corrupt → parse → classify
    * in one codegen stage) up to a 3-group census aggregate. The parse +
    * classification is [[graft.streaming.DeadLetter.classified]] — the
    * SAME code the streaming router runs, so the batch oracle certifies
    * the live path's routing decision too.
    */
  def dlqSplit(s: SparkSession, dir: String): DataFrame = {
    val good = concat_ws(",",
      col("event_id"), col("user_id"), col("event_type"), col("value"))
    val body = when(col("event_id") % 97 === 0,
        concat_ws(",", col("event_id"), col("user_id")))
      .when(col("event_id") % 101 === 0,
        concat_ws(",", col("event_id"), col("user_id"), col("event_type"),
          lit("not_a_number")))
      .otherwise(good)
    graft.streaming.DeadLetter.classified(
        Tables.events(s, dir).select(col("event_id"), body.as("body")))
      .groupBy(col("disposition"))
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("first_id"),
        max(col("event_id")).as("last_id"))
      .orderBy(col("disposition"))
  }

  val oracle: Map[String, String] = Map(
    // The NULL arms mirror concat_ws's skip-null serialization exactly:
    // each NULL among (user_id, event_type, value) drops one body field,
    // so a 3-field body reads as a misaligned-but-present etype with a
    // missing reading (type fault) and a <=2-field body loses etype
    // entirely (truncated). The fixtures carry no NULLs, but the two
    // routes must agree even if a future one does.
    "ingest_dlq_split" ->
      """WITH c AS (
        |  SELECT event_id,
        |         CASE WHEN user_id IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN event_type IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN value IS NULL THEN 0 ELSE 1 END AS nn,
        |         user_id, event_type
        |  FROM events),
        |d AS (
        |  SELECT event_id,
        |         CASE WHEN event_id % 97 = 0 THEN 'dead_letter_truncated'
        |              WHEN event_id % 101 = 0 THEN
        |                CASE WHEN user_id IS NULL AND event_type IS NULL
        |                     THEN 'dead_letter_truncated'
        |                     ELSE 'dead_letter_badtype' END
        |              WHEN nn = 3 THEN 'ok'
        |              WHEN nn = 2 THEN 'dead_letter_badtype'
        |              ELSE 'dead_letter_truncated' END AS disposition
        |  FROM c)
        |SELECT disposition, count(*) AS n,
        |       min(event_id) AS first_id, max(event_id) AS last_id
        |FROM d GROUP BY disposition ORDER BY disposition""".stripMargin,
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
    "exactly_once_upsert" -> exactlyOnceUpsert,
    "ingest_dlq_split" -> dlqSplit
  )
}
