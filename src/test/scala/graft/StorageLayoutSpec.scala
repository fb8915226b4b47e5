package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-layout scale levers, demonstrated and plan-audited: bucketing
  * (co-located joins with NO exchange on either side) and date
  * partitioning (partition pruning at the source). At 100 TB these are the
  * difference between a shuffle of the fact table and none at all.
  */
class StorageLayoutSpec extends SparkSpec {

  test("bucketed tables join without any shuffle exchange") {
    // tables land in the default warehouse (spark-warehouse/, gitignored);
    // drop metadata AND stale physical dirs from any earlier aborted run
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    Seq("li_b", "ord_b").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(wh, t))
    }
    Tables.lineitem(spark, sf0001)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    Tables.orders(spark, sf0001)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    // disable broadcast so the join itself must pick a strategy
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      // inspect only the AQE final plan (toString appends the initial one)
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), p)
      assert("Bucketed: true".r.findAllIn(p).length === 2, p)
      // the ONLY exchange is the post-join aggregation shuffle — nothing
      // below the join repartitions the bucketed sides
      val joinPart = p.substring(p.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$p")
      // same join on plain parquet DOES shuffle both sides
      val unbucketed = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      unbucketed.collect()
      val p2 = unbucketed.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(p2).length >= 2, p2)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("date-partitioned writes enable partition pruning at the scan") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events"
    Tables.events(spark, sf0001)
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .filter(col("day") === "2024-01-15")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    pruned.collect()
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(day"), p)
    // the pruned scan reads only the matching partition's files
    val allDays = spark.read.parquet(dir)
      .select("day").distinct().count()
    assert(allDays > 1, "fixture spans multiple days")
  }
}
