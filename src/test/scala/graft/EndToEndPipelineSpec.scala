package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{Envelope, SensorGenerator}
import graft.streaming.{DeliverySemantics, JdbcUpsert}

/** The reference's consumer graph (EP3, SURVEY.md §3) end-to-end:
  * stream of CSV sensor messages → positional parse against the declared
  * schema → per-message processing → UPSERT into a real database keyed on
  * the producer-minted counter — killed mid-stream by the Simulate Error
  * pattern and restarted from the checkpoint. The database must hold every
  * counter exactly once (README.md:159–164).
  */
class EndToEndPipelineSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftee;create=true"

  test("stream -> parse -> process -> JDBC upsert survives crash exactly-once") {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try st.execute("DROP TABLE sensordata") catch { case _: Throwable => () }
      st.execute(
        """CREATE TABLE sensordata (
          |  counter BIGINT PRIMARY KEY, deviceid INT, temperature DOUBLE,
          |  humidity DOUBLE, presence INT)""".stripMargin)
    } finally c.close()

    val base = Files.createTempDirectory("graft_e2e").toString
    val srcDir = s"$base/src"
    // producer graph (EP2): serialize readings to CSV bodies, 4 deliveries
    (0 until 4).foreach { i =>
      SensorGenerator.toCsvBody(SensorGenerator.batch(spark, 25, i * 25L))
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    val schema = spark.read.parquet(srcDir).schema
    def start(crashAtBatch: Option[Long]) =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          if (crashAtBatch.contains(id))
            sys.error("unexpected value received")
          // consumer graph: parse the CSV body (HANA Client semantics),
          // "process" (projection stands in for the JS script stage),
          // idempotent keyed upsert into the DB
          val parsed = Envelope.parseBody(batch)
            .selectExpr("CAST(counter AS BIGINT) AS counter", "deviceid",
              "temperature", "humidity", "presence")
          JdbcUpsert.write(parsed, url, "sensordata", Seq("counter"))
        }
        .start()

    val q1 = start(crashAtBatch = Some(2))
    intercept[Exception] { q1.awaitTermination() }
    val q2 = start(crashAtBatch = None)
    q2.awaitTermination()

    val c2 = DriverManager.getConnection(url)
    try {
      val rs = c2.createStatement().executeQuery(
        "SELECT count(*), count(DISTINCT counter), min(counter), max(counter) FROM sensordata")
      rs.next()
      assert(rs.getLong(1) === 100L, "every message exactly once")
      assert(rs.getLong(2) === 100L)
      assert(rs.getLong(3) === 0L && rs.getLong(4) === 99L)
    } finally c2.close()

    // audit through the engine's own gap query too
    val landed = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "sensordata").load()
    val audit = DeliverySemantics.auditGaps(landed, "counter")
      .collect().head
    assert(audit.getAs[Long]("lost") === 0L)
    assert(audit.getAs[Long]("duplicated") === 0L)
  }
}
