package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's Data Generator (reference README.md:4, README.md:88):
  * an unbounded source emitting one sensor reading per tick as a CSV string
  * message, with a monotonically increasing `counter` prepended — the
  * message id the whole exactly-once design keys on.
  *
  * Batch twin: `spark.range(n)` (contiguous ids — NOT
  * `monotonically_increasing_id()`, which is partition-skewed and gapped,
  * breaking the reference's contiguous-COUNTER semantics, SURVEY.md §7).
  * Streaming twin: the rate source, whose `value` column provides the same
  * contiguous counter. Sensor columns are derived deterministically from
  * the counter via xxhash64, so any (counter) row is reproducible on any
  * executor — replays regenerate identical messages, which is what makes
  * the delivery-semantics tests meaningful.
  *
  * Value ranges follow the reference's observed data
  * (images/HanaOutputAtMostOnceFirst.png): deviceid ∈ {2..6},
  * temperature ≈ 25.x, humidity ≈ 47–56.
  */
object SensorGenerator {

  /** uniform [0,1) derived from (counter, salt) — deterministic, branchless. */
  private def u(salt: Int) =
    (pmod(xxhash64(col("counter"), lit(salt)), lit(1000000L)) / 1000000.0)

  /** Attach the sensor columns of the reference's DDL (README.md:144–146)
    * to a DataFrame bearing a `counter` column.
    */
  def withSensorColumns(df: DataFrame): DataFrame =
    df.withColumn("deviceid", (pmod(xxhash64(col("counter"), lit(0)),
        lit(5L)) + 2).cast("int"))
      .withColumn("temperature", round(lit(24.0) + u(1) * 3.0, 2))
      .withColumn("humidity", round(lit(47.0) + u(2) * 9.0, 2))
      .withColumn("co2", round(u(3) * 1000.0, 2))
      .withColumn("co", round(u(4), 4))
      .withColumn("lpg", round(u(5), 4))
      .withColumn("smoke", round(u(6), 4))
      .withColumn("presence", (pmod(xxhash64(col("counter"), lit(7)),
        lit(2L))).cast("int"))
      .withColumn("light", round(u(8) * 100.0, 2))
      .withColumn("sound", round(u(9) * 60.0, 2))

  /** Bounded generator: `n` contiguous readings starting at `start`. */
  def batch(spark: SparkSession, n: Long, start: Long = 0L): DataFrame =
    withSensorColumns(
      spark.range(start, start + n).select(col("id").as("counter")))

  /** Unbounded generator: the rate source's contiguous `value` as counter.
    * (The reference demos 1 msg / 5 s — images/wiretap1.png; default here
    * is faster so tests finish.)
    */
  def stream(spark: SparkSession, rowsPerSecond: Int = 10): DataFrame =
    withSensorColumns(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond).load()
        .select(col("value").as("counter")))

  private val csvCols = Seq("counter", "deviceid", "temperature", "humidity",
    "co2", "co", "lpg", "smoke", "presence", "light", "sound")

  /** Serialize to the wire shape: one CSV string body per message
    * (README.md:4), keyed by counter.
    */
  def toCsvBody(df: DataFrame): DataFrame =
    df.select(col("counter").as("key"),
      concat_ws(",", csvCols.map(col): _*).as("body"))
}
