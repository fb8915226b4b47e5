package graft

import org.apache.spark.sql.functions._

import graft.operators.JoinOps

/** join_bloom_prefilter — the explicit runtime-filter pattern. Three
  * properties make it the production shape and all three are asserted
  * here: (1) the bloom is TRANSPARENT (result ≡ plain semi join — false
  * positives die in the exact join, false negatives cannot exist),
  * (2) it actually PRUNES (the filter kills a substantial fraction of
  * probe rows before any exchange), and (3) it sits BELOW the join in
  * the physical plan (no Exchange between the md5 filter and the
  * customer scan — the rows it kills never pay shuffle cost).
  */
class JoinBloomPrefilterSpec extends SparkSpec {

  test("bloom prefilter is transparent: result equals the plain semi join") {
    val got = JoinOps.bloomPrefilter(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val build = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 480000.0)
      .select(col("o_custkey")).distinct()
    val want = Tables.customer(spark, sf0001)
      .join(build, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("bloom prunes the probe side and admits every true key") {
    val (build, pred) = JoinOps.bloomBuildAndPredicate(spark, sf0001)
    val customer = Tables.customer(spark, sf0001)
    val total = customer.count()
    val pass = customer.filter(expr(pred)).count()
    // true keys present among customers
    val trueKeys = customer
      .join(build, col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    // no false negatives: every truly-joining customer passes the bloom
    val truePass = customer
      .join(build, col("c_custkey") === col("o_custkey"), "left_semi")
      .filter(expr(pred)).count()
    assert(truePass === trueKeys)
    // real pruning: under half the probe rows survive at this build
    // selectivity (45/150 true keys + <1% FP at 65536 bits)
    assert(pass < total * 6 / 10, s"bloom passed $pass of $total")
    assert(pass >= trueKeys)
  }

  test("the md5 bloom filter sits below any exchange on the probe side") {
    val p = finalPlan(JoinOps.bloomPrefilter(spark, sf0001))
    val lines = p.linesIterator.toVector
    val fIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("md5"))
    assert(fIdx >= 0, p)
    val scanIdx = lines.indexWhere(
      l => l.contains("FileScan parquet") && l.contains("customer"), fIdx)
    assert(scanIdx > fIdx, p)
    val between = lines.slice(fIdx + 1, scanIdx)
    assert(!between.exists(_.contains("Exchange")),
      s"exchange between bloom filter and customer scan:\n$p")
  }
}
