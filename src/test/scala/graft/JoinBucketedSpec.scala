package graft

import org.apache.spark.sql.functions._

import graft.operators.JoinOps

/** join_bucketed_colocated — the shuffle-free co-located join. The whole
  * point is the ABSENCE of exchanges: both tables are bucketed+sorted by
  * the join key at write time, so the SMJ and the downstream per-key
  * aggregate both consume the bucketed distribution directly.
  */
class JoinBucketedSpec extends SparkSpec {

  test("bucketed join plans with ZERO hash exchanges and matches the " +
    "plain unbucketed join") {
    val df = JoinOps.bucketedColocated(spark, sf0001)
    val p = finalPlan(df)
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$p")
    assert(p.contains("SortMergeJoin"), p)
    // result parity with the plain join on raw parquet
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)")
          .as("sum_qty"))
      .orderBy(col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty && got.sameElements(want))
  }
}
