package graft

import java.sql.DriverManager

import graft.sources.SensorGenerator
import graft.streaming.JdbcUpsert

/** Executor-side JDBC upsert against embedded Derby (in the Spark jars) —
  * the UPSERT-with-PRIMARY-KEY sink of the reference's exactly-once graph
  * (README.md:152–154), MERGE dialect.
  */
class JdbcUpsertSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withStmt[A](f: java.sql.Statement => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c.createStatement()) finally c.close()
  }

  test("mergeSql renders a keyed ANSI MERGE for native-upsert dialects") {
    val sql = JdbcUpsert.mergeSql("sensordata",
      Seq("counter", "deviceid", "temperature"), Seq("counter"))
    assert(sql.contains("MERGE INTO sensordata t"))
    assert(sql.contains("ON t.counter = s.counter"))
    assert(sql.contains(
      "WHEN MATCHED THEN UPDATE SET t.deviceid = s.deviceid, t.temperature = s.temperature"))
    assert(sql.contains(
      "WHEN NOT MATCHED THEN INSERT (counter, deviceid, temperature)"))
  }

  // The HANA Client's `Table initialization: Create`: first write against
  // a missing table creates it from the DataFrame schema with the upsert
  // key as PRIMARY KEY; subsequent writes round-trip through the same
  // table idempotently.
  test("createIfAbsent: missing table is created, then upserts round-trip") {
    withStmt { st =>
      try st.execute("DROP TABLE autotbl") catch { case _: Throwable => () }
    }
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "tag", "x")
    JdbcUpsert.write(df, url, "autotbl", Seq("k"), createIfAbsent = true)
    // replay + changed payload: same table, upsert semantics
    val df2 = Seq((2L, "B", 9.9), (3L, "c", 3.5)).toDF("k", "tag", "x")
    JdbcUpsert.write(df2, url, "autotbl", Seq("k"), createIfAbsent = true)
    withStmt { st =>
      val rs = st.executeQuery(
        "SELECT count(*), max(k) FROM autotbl")
      rs.next()
      assert(rs.getLong(1) === 3L && rs.getLong(2) === 3L)
      val rs2 = st.executeQuery("SELECT tag FROM autotbl WHERE k = 2")
      rs2.next()
      assert(rs2.getString(1) === "B")
      // the PK really is enforced by the created DDL
      val dup = try {
        st.execute("INSERT INTO autotbl VALUES (1, 'dup', 0.0)")
        false
      } catch { case _: java.sql.SQLException => true }
      assert(dup, "created table must carry the PRIMARY KEY")
    }
    assert(JdbcUpsert.createTableSql("t",
      Tables.orders(spark, sf0001).select("o_orderkey", "o_orderstatus")
        .schema, Seq("o_orderkey"))
      .startsWith("CREATE TABLE t (o_orderkey BIGINT"))
  }

  // Regression for the pending-keys flush: two rows with the same key in
  // ONE partition both take the insert path; without the flush the second
  // INSERT queues behind the first and executeBatch raises a PK violation.
  test("two same-key rows in one partition: no PK violation, last write wins") {
    withStmt { st =>
      try st.execute("DROP TABLE dupkeys") catch { case _: Throwable => () }
      st.execute("CREATE TABLE dupkeys (k BIGINT PRIMARY KEY, v INT)")
    }
    import spark.implicits._
    val df = Seq((1L, 1), (2L, 5), (1L, 2)).toDF("k", "v").coalesce(1)
    assert(df.rdd.getNumPartitions === 1)
    JdbcUpsert.write(df, url, "dupkeys", Seq("k"))
    withStmt { st =>
      val rs = st.executeQuery("SELECT v FROM dupkeys WHERE k = 1")
      rs.next()
      assert(rs.getInt(1) === 2, "last write within the partition must win")
      val rs2 = st.executeQuery("SELECT count(*) FROM dupkeys")
      rs2.next()
      assert(rs2.getLong(1) === 2L)
    }
  }

  // Regression for binary-key normalization: Array[Byte] compares by
  // reference, so without normalization a duplicate binary key slips past
  // pendingKeys and the PK violation resurfaces.
  test("duplicate binary keys in one partition are detected") {
    withStmt { st =>
      try st.execute("DROP TABLE binkeys") catch { case _: Throwable => () }
      st.execute(
        "CREATE TABLE binkeys (k CHAR(4) FOR BIT DATA PRIMARY KEY, v INT)")
    }
    import spark.implicits._
    val key = Array[Byte](1, 2, 3, 4)
    val df = Seq((key.clone(), 1), (key.clone(), 2)).toDF("k", "v")
      .coalesce(1)
    JdbcUpsert.write(df, url, "binkeys", Seq("k"))
    withStmt { st =>
      val rs = st.executeQuery("SELECT count(*), max(v) FROM binkeys")
      rs.next()
      assert(rs.getLong(1) === 1L && rs.getInt(2) === 2)
    }
  }

  // Regression: write() supports binary keys, so createIfAbsent must be
  // able to mint the table for them too (Derby bit-data syntax).
  test("createIfAbsent handles a binary key column") {
    withStmt { st =>
      try st.execute("DROP TABLE binauto") catch { case _: Throwable => () }
    }
    import spark.implicits._
    val df = Seq((Array[Byte](1, 2), 1), (Array[Byte](3, 4), 2))
      .toDF("k", "v")
    JdbcUpsert.write(df, url, "binauto", Seq("k"), createIfAbsent = true)
    JdbcUpsert.write(df, url, "binauto", Seq("k"), createIfAbsent = true)
    withStmt { st =>
      val rs = st.executeQuery("SELECT count(*) FROM binauto")
      rs.next()
      assert(rs.getLong(1) === 2L, "binary-keyed upserts must round-trip")
    }
  }

  // Regression for the ensureTable race: two writers both probe "missing";
  // the loser's CREATE fails already-exists, re-probes, and proceeds —
  // exactly one caller reports having created the table, nobody throws.
  test("ensureTable: concurrent callers resolve the create race cleanly") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("v", IntegerType)))
    (1 to 5).foreach { round =>
      val tbl = s"racetbl$round"
      withStmt { st =>
        try st.execute(s"DROP TABLE $tbl") catch { case _: Throwable => () }
      }
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val gate = new java.util.concurrent.CountDownLatch(1)
      val attempts = (1 to 4).map { _ =>
        Future { gate.await(); JdbcUpsert.ensureTable(url, tbl, schema, Seq("k")) }
      }
      gate.countDown()
      val created = Await.result(Future.sequence(attempts), 30.seconds)
      assert(created.count(identity) === 1,
        s"exactly one racer must create, got $created")
    }
  }

  // Regression for the probe's SQLState scoping: a probe failure that is
  // NOT table-not-found (here: a syntax error from an invalid name) must
  // propagate instead of being read as "missing" and triggering a CREATE.
  test("ensureTable: non-missing probe errors propagate, no CREATE attempted") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("v", IntegerType)))
    val e = intercept[java.sql.SQLException] {
      JdbcUpsert.ensureTable(url, "WHERE", schema, Seq("k"))
    }
    assert(e.getSQLState != null && e.getSQLState.startsWith("42"),
      s"expected the raw syntax error, got ${e.getSQLState}: ${e.getMessage}")
  }

  test("upsert twice == once, and replayed rows update not duplicate") {
    withStmt { st =>
      try st.execute("DROP TABLE sensordata") catch { case _: Throwable => () }
      st.execute(
        """CREATE TABLE sensordata (
          |  counter BIGINT PRIMARY KEY, deviceid INT, temperature DOUBLE,
          |  humidity DOUBLE)""".stripMargin)
    }
    val cols = Seq("counter", "deviceid", "temperature", "humidity")
    val b1 = SensorGenerator.batch(spark, 10, 0)
      .selectExpr(cols: _*)
    // first delivery
    JdbcUpsert.write(b1, url, "sensordata", Seq("counter"))
    // crash-replay: overlapping redelivery of 5..14
    val b2 = SensorGenerator.batch(spark, 10, 5).selectExpr(cols: _*)
    JdbcUpsert.write(b2, url, "sensordata", Seq("counter"))
    // replay the whole second batch again (checkpoint re-run)
    JdbcUpsert.write(b2, url, "sensordata", Seq("counter"))
    withStmt { st =>
      val rs = st.executeQuery(
        "SELECT count(*), count(DISTINCT counter), min(counter), max(counter) FROM sensordata")
      rs.next()
      assert(rs.getLong(1) === 15L) // exactly-once: 0..14, no dups
      assert(rs.getLong(2) === 15L)
      assert(rs.getLong(3) === 0L && rs.getLong(4) === 14L)
    }
    // update semantics: same key, changed payload → MERGE updates in place
    import spark.implicits._
    val changed = Seq((3L, 99, 11.5, 22.5))
      .toDF("counter", "deviceid", "temperature", "humidity")
    JdbcUpsert.write(changed, url, "sensordata", Seq("counter"))
    withStmt { st =>
      val rs = st.executeQuery(
        "SELECT deviceid FROM sensordata WHERE counter = 3")
      rs.next()
      assert(rs.getInt(1) === 99)
      val rs2 = st.executeQuery("SELECT count(*) FROM sensordata")
      rs2.next()
      assert(rs2.getLong(1) === 15L)
    }
  }
}
