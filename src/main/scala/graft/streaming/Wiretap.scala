package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** The reference's Wiretap operator (reference README.md:64,
  * images/wiretap1.png): a pass-through that logs what flows past without
  * altering the stream. Spark-native form: `df.observe(...)` metrics (an
  * accumulator-backed aggregate evaluated DURING the pass — no second
  * scan, no action) + a QueryExecutionListener that collects them when the
  * query completes. The reference's ack-edge role of the wiretap is
  * subsumed by Spark's post-sink checkpoint commit (SURVEY.md §2a op 9).
  */
object Wiretap {

  case class Tap(name: String, metrics: Map[String, Any])

  /** Attach a wiretap observation to `df`: row count plus min/max of
    * `keyCol` (the reference logs the offset range that passed).
    */
  def tap(df: DataFrame, name: String, keyCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      min(col(keyCol)).as("min_key"),
      max(col(keyCol)).as("max_key"))

  /** Listener that records every named observation from completed
    * (batch) queries. Register once per session; read+clear from tests or
    * monitoring.
    */
  class Recorder extends QueryExecutionListener {
    val taps = new ConcurrentLinkedQueue[Tap]()
    private def collect(qe: QueryExecution): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        taps.add(Tap(name,
          row.schema.fieldNames.zip(row.toSeq).toMap))
      }
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = collect(qe)
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }

  def install(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r)
    r
  }
}

/** The reference's 1:2 Multiplexer (README.md:4,
  * images/simpleIngestion.png): fan one message stream out to two sinks
  * in parallel. Spark-native form: persist the batch once, write twice —
  * the source is scanned a single time, not once per sink.
  */
object Multiplexer {
  def fanOut(df: DataFrame)(sinkA: DataFrame => Unit,
      sinkB: DataFrame => Unit): Unit = {
    val cached = df.persist()
    try {
      cached.count() // materialize once
      sinkA(cached)
      sinkB(cached)
    } finally cached.unpersist()
  }
}
