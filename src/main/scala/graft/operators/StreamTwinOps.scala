package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Batch twins of the streaming windowed aggregations (SURVEY.md §2b
  * "Streaming"). The same `window()`/sessionization logic the streaming
  * module runs with watermarks (graft.streaming) — expressed over the
  * bounded `events` table so DuckDB can oracle-check the semantics.
  *
  * Session windows are built from plain window functions (lag-gap →
  * cumulative session index) rather than Spark's `session_window`, so the
  * oracle runs the IDENTICAL definition (SURVEY.md §7 risks).
  *
  * Scale notes: tumbling/sliding aggregate on (window × type) — group
  * count bounded by time-range/step × |types|, tiny vs input; sliding emits
  * window_duration/slide rows per input (2× here) before partial
  * aggregation. Sessionization shuffles once on user_id.
  */
object StreamTwinOps extends OpModule {

  /** Tumbling 1-hour event counts per type. */
  def tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        window(col("ts"), "1 hour")("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("window_start"), col("event_type"))

  /** Sliding 1-hour window, 30-minute slide: each event lands in 2 windows.
    */
  def sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        window(col("ts"), "1 hour", "30 minutes")("start")
          .as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("window_start"), col("event_type"))

  /** Sessionization with a 30-minute inactivity gap, via lag-gap + running
    * session index (the DuckDB-honest form).
    */
  def session(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val runningIdx = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
            30L * 60 * 1000000, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(runningIdx))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling_count" -> tumbling,
    "stream_sliding" -> sliding,
    "stream_session" -> session
  )

  val oracle: Map[String, String] = Map(
    "stream_tumbling_count" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |       event_type, count(*) AS n,
        |       count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_sliding" ->
      """SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
        |         - o.off AS window_start,
        |       event_type, count(*) AS n
        |FROM events
        |CROSS JOIN (VALUES (INTERVAL '0 minutes'), (INTERVAL '30 minutes'))
        |       AS o(off)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_session" ->
      """WITH g AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |         lag(CAST(ts AS TIMESTAMP), 1) OVER w AS prev_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                   OR date_diff('microsecond', prev_ts, ts)
        |                      > 30 * 60 * 1000000
        |                 THEN 1 ELSE 0 END AS new_session
        |  FROM g
        |), idx AS (
        |  SELECT *, CAST(SUM(new_session) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end
        |FROM idx GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin
  )
}
