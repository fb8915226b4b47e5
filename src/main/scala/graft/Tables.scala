package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Every operator in the engine takes `(SparkSession, sfDir)` and reads its
  * inputs through here, so the scan layer stays in one place: explicit
  * parquet reads (schema comes from parquet footers — deterministic, never
  * `inferSchema` on text formats), which Catalyst turns into vectorized,
  * column-pruned, filter-pushed `FileSourceScanExec`s. At 100 TB the same
  * call works unchanged — parquet footer pruning + partition pruning scale
  * with file count, and each query only pays for the columns/row-groups it
  * actually touches.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to its µs TimestampType. Read it as raw nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to µs — exactly
    * what DuckDB does when it loads the same file, so oracle comparisons
    * stay bit-identical.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  private def expr(e: String) = org.apache.spark.sql.functions.expr(e)

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
