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

  test("stream -> parse -> BPE encode -> JDBC upsert survives crash " +
    "exactly-once (the tokenizer stage inside the ingest graph)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try st.execute("DROP TABLE bpetokens") catch { case _: Throwable => () }
      st.execute(
        """CREATE TABLE bpetokens (
          |  doc_id BIGINT PRIMARY KEY, n_toks_orig BIGINT,
          |  n_toks_enc BIGINT, compression_bp BIGINT)""".stripMargin)
    } finally c.close()

    val base = Files.createTempDirectory("graft_e2e_bpe").toString
    val srcDir = s"$base/src"
    (0 until 4).foreach { i =>
      SensorGenerator.toCsvBody(SensorGenerator.batch(spark, 25, i * 25L))
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    val schema = spark.read.parquet(srcDir).schema
    // frozen tokenizer model: two ranked merges every doc-text triggers
    // (the serving-time artifact a real pipeline loads from the BPE
    // train job's store — here hand-pinned so the expected counts are
    // computable independently of the shared encode code path)
    val mergeTable = Seq((0L, "s", "t"), (1L, "st", "a"))
      .toDF("merge_rank", "a", "b")
    def start(crashAtBatch: Option[Long]) = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      // consumer graph with the TOKENIZER stage between parse and sink:
      // positional CSV parse → doc construction ("s t a <counter>
      // <deviceid> <presence>" — 6 whitespace tokens, the first three
      // constants so both merges fire on every row) → frozen-vocab
      // streaming encode (stateless narrow map, no state store) →
      // idempotent keyed upsert
      val parsed = Envelope.parseBody(stream)
      val docs = parsed.select(
        col("counter").cast("long").as("doc_id"),
        concat_ws(" ", lit("s"), lit("t"), lit("a"), col("counter"),
          col("deviceid"), col("presence")).as("text"))
      graft.streaming.StreamingBpeEncode.encoded(docs, mergeTable)
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          if (crashAtBatch.contains(id))
            sys.error("unexpected value received")
          JdbcUpsert.write(batch, url, "bpetokens", Seq("doc_id"))
        }
        .start()
    }

    val q1 = start(crashAtBatch = Some(2))
    intercept[Exception] { q1.awaitTermination() }
    val q2 = start(crashAtBatch = None)
    q2.awaitTermination()

    val c2 = DriverManager.getConnection(url)
    try {
      val rs = c2.createStatement().executeQuery(
        """SELECT count(*), count(DISTINCT doc_id), min(doc_id),
          |  max(doc_id), min(n_toks_orig), max(n_toks_orig),
          |  min(n_toks_enc), max(n_toks_enc), min(compression_bp),
          |  max(compression_bp)
          |FROM bpetokens""".stripMargin)
      rs.next()
      assert(rs.getLong(1) === 100L, "every message exactly once")
      assert(rs.getLong(2) === 100L)
      assert(rs.getLong(3) === 0L && rs.getLong(4) === 99L)
      // 6 tokens in, both merges fire (s t → st, st a → sta) → 4 out;
      // 4·10000/6 = 6666 bp — constant across rows, computed here
      // independently of the shared bpeEncodeTokens code path
      assert(rs.getLong(5) === 6L && rs.getLong(6) === 6L)
      assert(rs.getLong(7) === 4L && rs.getLong(8) === 4L)
      assert(rs.getLong(9) === 6666L && rs.getLong(10) === 6666L)
    } finally c2.close()
  }
}
