package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator category = one module. `queries` maps a SURVEY.md §2b
  * operator name to its DataFrame builder; `oracle` holds the DuckDB twin
  * (omitted for non-SQL-expressible ops → driver falls back to a rows>0
  * check). SparkEntry concatenates all registered modules.
  */
trait OpModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
