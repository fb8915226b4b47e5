package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.WindowOps

/** The two-pass [[WindowOps.spreadRank]] machinery must be value-identical
  * to the key-partitioned window built-ins it replaces (win_distribution /
  * win_rank_dense had a parallelism ceiling of 5 / 25 tasks — the
  * segment/brand cardinality — at any data size), while spreading the
  * per-row work across the range-partition count instead.
  */
class SpreadRankSpec extends SparkSpec {

  test("win_distribution matches the classic window form bit-for-bit") {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val classic = Tables.customer(spark, sf0001)
      .select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("c_custkey"))
      .collect()
    val spread = WindowOps.distribution(spark, sf0001).collect()
    assert(spread.nonEmpty)
    assert(spread.toSeq === classic.toSeq)
  }

  test("win_rank_dense matches the classic window form, ties included") {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc)
    val classic = Tables.part(spark, sf0001)
      .withColumn("price_rank", rank().over(w))
      .withColumn("price_dense", dense_rank().over(w))
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        col("price_rank"), col("price_dense"))
      .orderBy(col("p_partkey"))
      .collect()
    val spread = WindowOps.rankDense(spark, sf0001).collect()
    assert(spread.nonEmpty)
    assert(spread.toSeq === classic.toSeq)
    // sf0.001's 200 parts happen to have no intra-brand price ties — the
    // synthetic-ties test below covers the tie semantics explicitly
  }

  test("spreadRank survives tie groups straddling range-partition boundaries") {
    import spark.implicits._
    // 3 keys × heavy ties, 16 range partitions on 300 rows: every tie
    // group spans multiple physical partitions
    val df = (1 to 300)
      .map(i => (s"k${i % 3}", (i % 5).toLong, i.toLong)).toDF("k", "v", "id")
    val grouped = df.groupBy(col("k"), col("v")).agg(count(lit(1)).as("__c"))
    val ranked = WindowOps.spreadRank(grouped, "k",
        Seq(col("v").desc), parts = 16, weight = Some("__c"))
      .withColumn("r", col("__pre") - col("__c") + 1)
      .withColumn("d", col("__rn"))
      .select(col("k"), col("v"), col("r"), col("d"))
    val viaJoin = df.join(ranked, Seq("k", "v"))
      .select(col("id"), col("r"), col("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc)
    val classic = df
      .select(col("id"), rank().over(w).cast("long").as("r"),
        dense_rank().over(w).cast("long").as("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(viaJoin.toSeq === classic.toSeq)
  }

  test("the heavy pass spreads beyond the key cardinality") {
    // the range pass must place one segment's rows across many physical
    // partitions — the whole point of the rewrite. 150 customers over 5
    // segments into 16 range partitions: far more than 5 distinct pids,
    // and no pid holds more than a sliver of a segment.
    val pids = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .repartitionByRange(16, col("c_mktsegment"), col("c_acctbal"),
        col("c_custkey"))
      .select(spark_partition_id().as("pid"), col("c_mktsegment"))
    assert(pids.select(col("pid")).distinct().count() > 5)
    val maxShare = pids.groupBy(col("c_mktsegment"), col("pid")).count()
      .agg(max(col("count"))).head().getLong(0)
    val segMax = pids.groupBy(col("c_mktsegment")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxShare < segMax,
      s"a single task still holds a whole segment ($maxShare rows)")
  }

  test("spreadRank output is stable across runs (boundary-sampling proof)") {
    val a = WindowOps.distribution(spark, sf0001).collect()
    val b = WindowOps.distribution(spark, sf0001).collect()
    assert(a.toSeq === b.toSeq)
  }
}
