package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's message model: a CSV string body plus an attribute
  * envelope carrying `kafka.topic/partition/offset/timestamp` and the
  * commit token `topic/partition/offset`
  * (reference images/wiretapAtMostOnce.png; README.md:106–108).
  */
object Envelope {

  /** The one relational schema in the reference (README.md:144–146). */
  case class SensorReading(
      counter: Int, deviceid: Int, temperature: Double, humidity: Double,
      co2: Double, co: Double, lpg: Double, smoke: Double, presence: Int,
      light: Double, sound: Double)

  /** Explicit StructType — externally declared DDL, never inference
    * (SURVEY.md §1.2).
    */
  val sensorSchema: StructType = Encoders.product[SensorReading].schema

  /** Positional CSV-body → typed columns: what the HANA Client operator
    * does against the table DDL (README.md:76–78). Expects a `body` string
    * column; malformed rows surface as nulls (PERMISSIVE), preserving the
    * at-least-once pipeline instead of killing the graph.
    */
  def parseBody(df: DataFrame): DataFrame =
    df.withColumn("m",
        from_csv(col("body"), sensorSchema, Map.empty[String, String]))
      .select((df.columns.filter(_ != "body").map(col).toSeq :+
        col("m.*")): _*)

  /** Mint the commit token `topic/partition/offset`
    * (images/wiretapAtMostOnce.png: "my_sensors_data/0/3") from envelope
    * columns of those names.
    */
  def withCommitToken(df: DataFrame): DataFrame =
    df.withColumn("commit_token",
      concat_ws("/", col("topic"), col("partition"), col("offset")))
}
