package graft

/** Every registered query must build and execute at sf0.001, and every
  * oracle entry must point at a registered query. The value-level gate is
  * the driver's DuckDB compare (tools/check.py locally); this spec catches
  * analysis errors and registry typos early.
  */
class QueriesSmokeSpec extends SparkSpec {
  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
