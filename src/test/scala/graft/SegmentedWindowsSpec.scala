package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{EventOps, WindowOps}

/** The segmented (hot-key-proof) window forms must equal their plain
  * window twins ROW FOR ROW — the two members cover the two algebraic
  * shapes a running window decomposes into: prefix-ADDITIVE (running
  * sum) and prefix-IDEMPOTENT pick (running last-touch). Both also
  * share their twins' DuckDB oracles, so Verify re-certifies this at
  * sf0.01 every round; this spec pins it at sf0.001 and checks the
  * plan actually re-keys the event-volume window on the segment.
  */
class SegmentedWindowsSpec extends SparkSpec {

  private def rows(df: DataFrame): Array[String] =
    df.collect().map(_.toSeq.mkString("|"))

  test("segmented running sum == plain running sum row for row") {
    val plain = rows(WindowOps.runningSum(spark, sf0001))
    val seg = rows(WindowOps.runningSumSegmented(spark, sf0001))
    assert(plain.nonEmpty)
    assert(seg.length === plain.length)
    assert(seg.sameElements(plain))
  }

  test("segmented running sum keys its big window on (customer, month)") {
    val p = finalPlan(WindowOps.runningSumSegmented(spark, sf0001))
    // the event-volume window partitions on (o_custkey, seg); a bare
    // o_custkey partitioning may appear only over the per-customer
    // MONTH GRID (the seg_total frame)
    assert(p.contains("seg"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("randomized: segmented running sum == window form across seeds " +
    "(hot keys, month-boundary ties, same-date ties, single-row months)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(seed)
      // 400 orders over 4 HOT customers across ~3 years; duplicate
      // order dates force the o_orderkey tie-break, and day-1/day-28
      // clustering exercises month boundaries
      val data = Seq.tabulate(400) { i =>
        val day = rng.nextInt(1000)
        (rng.nextInt(4).toLong, i.toLong, day,
          BigDecimal(rng.nextInt(100000)) / 100)
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_segwin_$seed").toString
      data.toDF("o_custkey", "o_orderkey", "day", "o_totalprice")
        .withColumn("o_orderdate",
          date_add(lit(java.sql.Date.valueOf("1995-01-01")), col("day"))
            .cast("timestamp"))
        .drop("day")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val plain = rows(WindowOps.runningSum(spark, dir))
      val seg = rows(WindowOps.runningSumSegmented(spark, dir))
      assert(seg.length === plain.length, s"seed $seed")
      assert(seg.sameElements(plain), s"seed $seed diverged")
    }
  }

  test("both segmented forms agree with their twins on the 10x-shaped " +
    "stress fixture (different key densities than the oracle fixture)") {
    val dir = "/root/repo/stressdata"
    assume(new java.io.File(s"$dir/orders.parquet").exists(),
      "stress fixture not generated on this machine")
    val plain = rows(WindowOps.runningSum(spark, dir))
    val seg = rows(WindowOps.runningSumSegmented(spark, dir))
    assert(seg.length === plain.length)
    assert(seg.sameElements(plain))
    val plainA = rows(EventOps.attribution(spark, dir))
    val segA = rows(EventOps.attributionSegmented(spark, dir))
    assert(segA.length === plainA.length)
    assert(segA.sameElements(plainA))
  }
}
