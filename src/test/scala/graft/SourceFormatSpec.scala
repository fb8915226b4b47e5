package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source-format coverage beyond parquet: CSV and JSON (line-delimited)
  * written and read back with EXPLICIT schemas (never inference — the
  * reference's schemas are externally declared DDL, SURVEY.md §1.2).
  * Round trips are asserted lossless on exact types.
  */
class SourceFormatSpec extends SparkSpec {

  private def ordersSlice = Tables.orders(spark, sf0001)
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  test("CSV round trip with explicit schema is lossless; filters push down") {
    val dir = Files.createTempDirectory("graft_csv").toString
    ordersSlice.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType.fromDDL(
      "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
        "o_orderpriority STRING")
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.count() === ordersSlice.count())
    assert(back.exceptAll(ordersSlice).isEmpty)
    assert(ordersSlice.exceptAll(back).isEmpty)
    // predicate reaches the CSV scan as a data filter
    val filtered = back.filter(col("o_orderkey") < 100)
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("DataFilters"),
      plan)
  }

  test("JSON-lines round trip with explicit schema is lossless") {
    val dir = Files.createTempDirectory("graft_json").toString
    ordersSlice.write.mode("overwrite").json(dir)
    val back = spark.read.schema(ordersSlice.schema).json(dir)
    assert(back.count() === ordersSlice.count())
    assert(back.exceptAll(ordersSlice).isEmpty)
    assert(ordersSlice.exceptAll(back).isEmpty)
  }

  test("ORC round trip is lossless and prunes columns at the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    ordersSlice.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === ordersSlice.count())
    assert(back.exceptAll(ordersSlice).isEmpty)
    assert(ordersSlice.exceptAll(back).isEmpty)
    // projection pruning reaches the ORC reader like parquet
    val slim = back.select("o_orderkey").filter(col("o_orderkey") < 100)
    slim.collect()
    val plan = slim.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint>"), plan)
    assert(plan.contains("PushedFilters"), plan)
  }

  test("malformed CSV rows surface as nulls (PERMISSIVE), not query death") {
    val dir = Files.createTempDirectory("graft_badcsv").toString
    val f = new java.io.PrintWriter(s"$dir/data.csv")
    f.println("1,10,F,1-URGENT")
    f.println("not_a_number,20,O,2-HIGH") // malformed key
    f.println("3,30,P,3-MEDIUM")
    f.close()
    val schema = StructType.fromDDL(
      "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
        "o_orderpriority STRING")
    val back = spark.read.schema(schema).csv(dir)
    assert(back.count() === 3)
    assert(back.filter(col("o_orderkey").isNull).count() === 1)
  }
}
