package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scans, projection, filters, and the reference's CSV message parse.
  *
  * The reference's only projection is the positional CSV-body → typed-column
  * parse done by the HANA Client operator (reference README.md:4 and the DDL
  * at README.md:144–146). `csv_parse_project` reproduces that round trip:
  * serialize a typed row to a CSV body, then parse it back with `from_csv`
  * against an explicit schema (never inference — the reference's schema is
  * externally declared DDL).
  *
  * Scale notes: filters and column selection here compile to parquet
  * PushedFilters + ReadSchema pruning, so a 100 TB scan only reads the
  * row groups and columns the query touches. No shuffle in either query
  * except the final tiny ordered output.
  */
object RelationalOps extends OpModule {

  /** Plain full-table scan with a stable order — exercises the parquet
    * source end-to-end (footer schema, vectorized read).
    */
  def scanParquet(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).orderBy(col("r_regionkey"))

  /** σ + π that must reach the scan: predicate pushdown on shipdate +
    * quantity, reading only 5 of 16 lineitem columns.
    */
  def filterPushdown(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") < to_timestamp(lit("1995-09-01")) &&
        col("l_quantity") > 30)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** The reference's message lifecycle as a query: typed row → CSV string
    * body (what the Data Generator emits, README.md:4) → `from_csv` back to
    * typed columns (what the HANA Client does positionally against the DDL).
    */
  def csvParseProject(s: SparkSession, dir: String): DataFrame = {
    val body = concat_ws(",",
      col("event_id"), col("user_id"), col("event_type"), col("value"))
    val schema = "counter BIGINT, device BIGINT, etype STRING, reading DOUBLE"
    Tables.events(s, dir)
      .select(col("event_id"), body.as("body"))
      .select(col("event_id"),
        from_csv(col("body"), org.apache.spark.sql.types.StructType.fromDDL(schema),
          Map.empty[String, String]).as("m"))
      .select(col("event_id"), col("m.counter").as("counter"),
        col("m.device").as("device"), col("m.etype").as("etype"),
        col("m.reading").as("reading"))
      .orderBy(col("event_id"))
  }

  /** Z-order layout census: interleave the low 8 bits of two clustering
    * dimensions (customer bucket × order-date day bucket) into one
    * space-filling-curve key, then audit the 256 top-level curve cells —
    * row count and the min/max span of BOTH dimensions inside each cell.
    *
    * Why it matters at 100 TB: writing a fact table
    * `repartitionByRange(zval).sortWithinPartitions(zval)` makes every
    * parquet file cover a bounded range of BOTH dimensions at once, so
    * footer min/max stats prune scans filtered on EITHER key — the
    * multi-dimensional clustering a single-column sort cannot give. The
    * census is the auditable artifact of that claim: per-cell dim spans
    * stay narrow (asserted in Round6OpsSpec), which IS the pruning bound.
    * The bit-interleave is pure integer arithmetic (same expression both
    * engines), and the whole query is one narrow projection + one
    * 256-group hash aggregate.
    */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val x = col("o_custkey") % 256
    val y = datediff(col("o_orderdate").cast("date"),
      to_date(lit("1992-01-01"))).cast("long") % 256
    // z = bit-interleave(x, y): x in even positions, y in odd
    def interleave(xc: org.apache.spark.sql.Column,
                   yc: org.apache.spark.sql.Column) =
      (0 until 8).map { b =>
        (shiftleft(shiftright(xc, b).bitwiseAND(1), 2 * b))
          .bitwiseOR(shiftleft(shiftright(yc, b).bitwiseAND(1), 2 * b + 1))
      }.reduce(_ bitwiseOR _)
    Tables.orders(s, dir)
      .select(x.as("x"), y.as("y"))
      .withColumn("zval", interleave(col("x"), col("y")))
      .withColumn("z_cell", shiftright(col("zval"), 8))
      .groupBy(col("z_cell"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy(col("z_cell"))
  }

  /** Sink/source format round-trip: a typed slice of `orders` (BIGINT,
    * STRING, DOUBLE, TIMESTAMP) written to the given format and read back
    * under the SAME explicit schema, value-oracled against the original
    * parquet rows — certifying the engine's non-parquet readers/writers
    * preserve every value bit for bit (doubles survive text formats via
    * Java's shortest-round-trip rendering; timestamps are pinned to an
    * explicit µs pattern on text formats so write and read agree).
    *
    * Scale note: these exist to certify FIDELITY of the secondary formats
    * the reference's ecosystem exchanges (CSV message bodies, JSON
    * envelopes, ORC lake tables) — the engine's perf path stays
    * partitioned parquet (StorageLayoutSpec). The write is
    * target-partitioned like any Spark sink, so the shape scales; the
    * oracle filter prunes the parquet scan before anything is written.
    */
  /** Per-JVM scratch root for the round-trip sinks: rooted in the system
    * temp dir (never the process CWD) and suffixed with a process nonce so
    * two concurrent runs of the same query can't overwrite the files the
    * other is reading back. */
  private lazy val roundtripBase: java.io.File = {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-rt-${java.util.UUID.randomUUID().toString.take(8)}")
    d.mkdirs()
    // deleteOnExit never fires on a non-empty directory, so a recursive
    // shutdown hook owns the cleanup — otherwise every JVM run leaks its
    // sink data in a fresh UUID-suffixed tmp directory
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(d)
    }))
    d
  }

  private def roundtrip(s: SparkSession, dir: String,
      fmt: String): DataFrame = {
    val src = Tables.orders(s, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1996-01-01")))
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
    val path = new java.io.File(roundtripBase,
      s"graft-roundtrip-$fmt-${Tables.dirTag(dir)}").getAbsolutePath
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val isText = fmt != "orc"
    val w = src.write.mode("overwrite").format(fmt)
    (if (isText) w.option("timestampFormat", tsFmt).option("header", "true")
     else w).save(path)
    val r = s.read.format(fmt).schema(src.schema)
    (if (isText) r.option("timestampFormat", tsFmt).option("header", "true")
     else r).load(path)
      .orderBy(col("o_orderkey"))
  }

  def roundtripOrc(s: SparkSession, dir: String): DataFrame =
    roundtrip(s, dir, "orc")
  def roundtripCsv(s: SparkSession, dir: String): DataFrame =
    roundtrip(s, dir, "csv")
  def roundtripJson(s: SparkSession, dir: String): DataFrame =
    roundtrip(s, dir, "json")

  /** Hive-style partition pruning — the layout decision that matters
    * most at 100 TB: events re-written `partitionBy("day")`, then read
    * back through a day-literal filter, which Spark satisfies from
    * DIRECTORY NAMES (PartitionFilters on the scan, plan-asserted in
    * StorageLayoutSpec) — zero non-matching files are opened, let alone
    * their row groups. The one-day rollup after the pruned scan is the
    * classic "daily report over a date-partitioned lake table" shape;
    * value sums go through DECIMAL for bit-exact oracle agreement. The
    * partitioned copy is written once per (JVM, fixture) into the
    * roundtrip scratch root — at production scale that write is the
    * nightly ingest layout job, paid once and serving every subsequent
    * day-filtered query for free.
    */
  def partitionPrune(s: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(roundtripBase,
      s"graft-bydate-${Tables.dirTag(dir)}")
    if (!path.exists()) {
      Tables.events(s, dir)
        .withColumn("day", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("day")
        .parquet(path.getAbsolutePath)
    }
    s.read.parquet(path.getAbsolutePath)
      .filter(col("day") === lit("2024-01-07").cast("date"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("user_id")).as("sum_uid"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_partition_prune" -> partitionPrune,
    "scan_parquet" -> scanParquet,
    "filter_pushdown" -> filterPushdown,
    "csv_parse_project" -> csvParseProject,
    "layout_zorder" -> zorderLayout,
    "sink_roundtrip_orc" -> roundtripOrc,
    "sink_roundtrip_csv" -> roundtripCsv,
    "sink_roundtrip_json" -> roundtripJson
  )

  /** The same bit-interleave as [[zorderLayout]], spelled out for DuckDB:
    * ((x>>b)&1)<<2b | ((y>>b)&1)<<(2b+1), summed over b = 0..7 by OR.
    */
  private val zInterleaveSql: String = (0 until 8).map { b =>
    s"(((x >> $b) & 1) << ${2 * b}) | (((y >> $b) & 1) << ${2 * b + 1})"
  }.mkString(" | ")

  /** One oracle serves all three round-trips: the read-back rows must
    * equal the original parquet rows, whatever format they detoured
    * through.
    */
  private val roundtripOracleSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
      |FROM orders
      |WHERE CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1996-01-01'
      |ORDER BY o_orderkey""".stripMargin

  val oracle: Map[String, String] = Map(
    "layout_partition_prune" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(user_id) AS BIGINT) AS sum_uid,
        |       min(value) AS min_value, max(value) AS max_value
        |FROM events
        |WHERE CAST(ts AS DATE) = DATE '2024-01-07'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_roundtrip_orc" -> roundtripOracleSql,
    "sink_roundtrip_csv" -> roundtripOracleSql,
    "sink_roundtrip_json" -> roundtripOracleSql,
    "layout_zorder" ->
      s"""WITH d AS (
        |  SELECT o_custkey % 256 AS x,
        |         CAST(date_diff('day', DATE '1992-01-01',
        |                        CAST(o_orderdate AS DATE)) AS BIGINT)
        |           % 256 AS y
        |  FROM orders),
        |z AS (SELECT x, y, ($zInterleaveSql) AS zval FROM d)
        |SELECT zval >> 8 AS z_cell, count(*) AS n,
        |       min(x) AS min_x, max(x) AS max_x,
        |       min(y) AS min_y, max(y) AS max_y
        |FROM z GROUP BY 1 ORDER BY z_cell""".stripMargin,
    "scan_parquet" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1995-09-01' AND l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "csv_parse_project" ->
      """WITH msg AS (
        |  SELECT event_id,
        |         event_id::VARCHAR || ',' || user_id::VARCHAR || ',' ||
        |         event_type || ',' || value::VARCHAR AS body
        |  FROM events)
        |SELECT event_id,
        |       split_part(body, ',', 1)::BIGINT AS counter,
        |       split_part(body, ',', 2)::BIGINT AS device,
        |       split_part(body, ',', 3) AS etype,
        |       split_part(body, ',', 4)::DOUBLE AS reading
        |FROM msg ORDER BY event_id""".stripMargin
  )
}
