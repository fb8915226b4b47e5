package graft.streaming

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Generic JDBC upsert writer — the SAP HANA Client operator's
  * `Insert mode: UPSERT` (reference README.md:152–154,
  * images/HanaConfigExactlyOnce.png) for any dialect.
  *
  * Spark's JDBC sink only appends/overwrites, so UPSERT runs through
  * `foreachPartition`: one connection per partition, one batched MERGE
  * per `batchSize` rows, commit per partition. Executor-side and
  * driver-free, so it scales with partition count; idempotence comes from
  * the statement (keyed MERGE), making it a legal exactly-once sink under
  * checkpoint replay (README.md:133's end-to-end-identifier argument).
  */
object JdbcUpsert {

  /** Dialect hook: render the upsert statement for `table` with `cols`,
    * keyed on `keyCols`. Defaults to ANSI MERGE (Derby, HANA-compatible);
    * HANA's native shorthand would be
    * `UPSERT table VALUES (?, ...) WITH PRIMARY KEY`.
    */
  def mergeSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
    val src = cols.map(c => s"? AS $c").mkString(", ")
    val on = keyCols.map(k => s"t.$k = s.$k").mkString(" AND ")
    val nonKey = cols.filterNot(keyCols.contains)
    val setClause = nonKey.map(c => s"t.$c = s.$c").mkString(", ")
    val insertCols = cols.mkString(", ")
    val insertVals = cols.map(c => s"s.$c").mkString(", ")
    s"""MERGE INTO $table t
       |USING (SELECT $src FROM SYSIBM.SYSDUMMY1) s
       |ON $on
       |WHEN MATCHED THEN UPDATE SET $setClause
       |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)"""
      .stripMargin
  }

  /** ANSI column type for the DDL renderer — the portable subset every
    * target dialect (Derby, HANA) accepts.
    */
  private def sqlType(dt: DataType): String = dt match {
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR(4000)"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    // Derby's binary syntax (bindOne already writes BinaryType via
    // setBytes); HANA would say VARBINARY(4000) — a native dialect should
    // override the renderer the way mergeSql documents
    case BinaryType => "VARCHAR (4000) FOR BIT DATA"
    case other =>
      throw new IllegalArgumentException(s"no DDL mapping for $other")
  }

  /** Render the CREATE TABLE for the HANA Client's
    * `Table initialization: Create` (reference README.md:76–78,
    * images/HanaConfigAtMostOnce.png): columns from the DataFrame schema,
    * PRIMARY KEY from `keyCols` (the UPSERT identity).
    */
  def createTableSql(table: String, schema: StructType,
      keyCols: Seq[String]): String = {
    val cols = schema.fields.map { f =>
      val notNull =
        if (!f.nullable || keyCols.contains(f.name)) " NOT NULL" else ""
      s"${f.name} ${sqlType(f.dataType)}$notNull"
    }
    s"CREATE TABLE $table (${cols.mkString(", ")}, " +
      s"PRIMARY KEY (${keyCols.mkString(", ")}))"
  }

  /** SQLStates that mean "this table does not exist": Derby 42X05, the
    * ODBC/MySQL/HANA family 42S02, Postgres 42P01, SQL Server S0002 — plus
    * a message fallback for dialects that bury the state, tightened to
    * require the PROBED TABLE'S NAME next to the not-exist phrasing (a
    * missing schema, missing column, or permission message would otherwise
    * misclassify as table-missing and trigger a doomed CREATE whose
    * failure masks the original error). Everything else (connection loss,
    * permissions, syntax) is NOT "missing" and must propagate.
    *
    * Deliberate tradeoff: a dialect whose not-exist message omits the
    * table name AND whose SQLState is ambiguous (Oracle's 42000 covers
    * syntax errors too) now propagates instead of auto-creating — the
    * reviewed-and-chosen failure direction, since a wrong CREATE destroys
    * state while a propagated probe error is actionable. Add such a
    * dialect's specific SQLState to the allowlist rather than loosening
    * the message check.
    */
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def isMissingTable(e: java.sql.SQLException,
      table: String): Boolean = {
    val state = Option(e.getSQLState).getOrElse("")
    val missing = Set("42X05", "42S02", "42P01", "S0002").contains(state) || {
      val msg = Option(e.getMessage).getOrElse("").toLowerCase
      // unqualified name too: dialects report "TABLE" for "schema.TABLE"
      val names = (table +: table.split('.').toSeq).map(_.toLowerCase)
        .filter(_.nonEmpty)
      (msg.contains("not exist") || msg.contains("not found")) &&
        names.exists(msg.contains)
    }
    // Surface the classification so a propagated probe error on a dialect
    // outside the allowlist (whose not-exist message omits the table name)
    // is diagnosable from the log rather than a silent behavior change.
    if (!missing)
      log.info(s"probe error on $table classified NOT-missing " +
        s"(SQLState=$state) — propagating instead of auto-creating: " +
        s"${e.getMessage}")
    missing
  }

  /** Create `table` if it does not exist yet (probed with a zero-row
    * SELECT — dialect-portable, no metadata-catalog case games). Returns
    * true if this call created it.
    *
    * Only table-not-found SQLStates count as "missing" ([[isMissingTable]]);
    * a transient connection/permission error propagates rather than
    * triggering a CREATE that then fails confusingly. The check-then-create
    * race (two concurrent writers both probing "missing") resolves by
    * re-probing after a failed CREATE: the loser proceeds once the table is
    * visible instead of surfacing the winner's already-exists error.
    */
  def ensureTable(url: String, table: String, schema: StructType,
      keyCols: Seq[String]): Boolean = {
    val conn: Connection = DriverManager.getConnection(url)
    try {
      def exists(): Boolean =
        try {
          conn.createStatement().executeQuery(
            s"SELECT 1 FROM $table WHERE 1=0").close()
          true
        } catch {
          case e: java.sql.SQLException if isMissingTable(e, table) => false
        }
      if (exists()) false
      else
        try {
          conn.createStatement().execute(createTableSql(table, schema, keyCols))
          true
        } catch {
          case e: java.sql.SQLException =>
            if (exists()) false // lost the create race — table is there now
            else throw e
        }
    } finally conn.close()
  }

  private def bindOne(ps: PreparedStatement, idx: Int, row: Row,
      f: StructField, i: Int): Unit =
    if (row.isNullAt(i)) ps.setObject(idx, null)
    else f.dataType match {
      case IntegerType => ps.setInt(idx, row.getInt(i))
      case LongType => ps.setLong(idx, row.getLong(i))
      case DoubleType => ps.setDouble(idx, row.getDouble(i))
      case StringType => ps.setString(idx, row.getString(i))
      case TimestampType => ps.setTimestamp(idx, row.getTimestamp(i))
      case BinaryType => ps.setBytes(idx, row.getAs[Array[Byte]](i))
      case _ => ps.setObject(idx, row.get(i))
    }

  private def bind(ps: PreparedStatement, row: Row, schema: StructType): Unit =
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      bindOne(ps, i + 1, row, f, i)
    }

  /** Upsert `df` into `table` keyed on `keyCols`, via the portable
    * UPDATE-then-INSERT protocol (works on any JDBC engine — Derby's MERGE
    * refuses non-table sources, and HANA prefers its native
    * `UPSERT ... WITH PRIMARY KEY`; engines with a usable native statement
    * should get a dedicated dialect built on [[mergeSql]]). Runs inside a
    * per-partition transaction, so a replayed micro-batch re-applies
    * idempotently. `url` must be reachable from executors (embedded Derby
    * in tests; a real endpoint in prod).
    */
  def write(df: DataFrame, url: String, table: String, keyCols: Seq[String],
      batchSize: Int = 500, createIfAbsent: Boolean = false): Unit = {
    val schema = df.schema
    if (createIfAbsent) ensureTable(url, table, schema, keyCols)
    val cols = schema.fieldNames.toSeq
    val nonKey = cols.filterNot(keyCols.contains)
    require(nonKey.nonEmpty, "upsert needs at least one non-key column")
    val updSql = s"UPDATE $table SET " +
      nonKey.map(c => s"$c = ?").mkString(", ") +
      " WHERE " + keyCols.map(k => s"$k = ?").mkString(" AND ")
    val insSql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (" +
      cols.map(_ => "?").mkString(", ") + ")"
    val updOrder = (nonKey ++ keyCols).map(schema.fieldIndex)
    val keyIdx = keyCols.map(schema.fieldIndex)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val upd = conn.prepareStatement(updSql)
          val ins = conn.prepareStatement(insSql)
          // Keys whose INSERT is still sitting in the JDBC batch: a second
          // row with the same key would also UPDATE 0 rows and queue a
          // second INSERT → PK violation at executeBatch. Flushing the
          // batch before touching such a key turns the second row into a
          // plain UPDATE (last-write-wins within the partition).
          val pendingKeys = scala.collection.mutable.HashSet.empty[Seq[Any]]
          rows.foreach { r =>
            // Array[Byte] compares by reference — normalize binary key
            // columns to value-equal Seqs so duplicate binary keys are
            // caught like any other type.
            val k: Seq[Any] = keyIdx.map(r.get(_) match {
              case bytes: Array[Byte] => bytes.toSeq
              case v => v
            })
            if (pendingKeys.contains(k)) {
              ins.executeBatch()
              pendingKeys.clear()
            }
            updOrder.zipWithIndex.foreach { case (fieldIdx, pos) =>
              bindOne(upd, pos + 1, r, schema.fields(fieldIdx), fieldIdx)
            }
            if (upd.executeUpdate() == 0) {
              bind(ins, r, schema)
              ins.addBatch()
              pendingKeys += k
              if (pendingKeys.size % batchSize == 0) {
                ins.executeBatch()
                pendingKeys.clear()
              }
            }
          }
          ins.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }
}
