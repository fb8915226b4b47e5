package graft

import org.apache.spark.sql.functions._

/** Adaptive-execution coverage: the engine's plans must stay right when
  * the optimizer runs in its production configuration — AQE re-planning
  * shuffles at runtime. Two behaviors matter at 100 TB: a skewed join key
  * must be split across tasks instead of becoming the straggler, and
  * over-partitioned shuffles must coalesce down to the data's real size.
  */
class AdaptiveExecSpec extends SparkSpec {

  /** Set runtime confs for the body, restoring previous values after. */
  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed side of a 90%-one-key sort-merge join") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      // isolate skew handling from partition coalescing
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // the SkewOps fixture shape: ~90% of probe rows carry one key
      val probe = spark.range(0, 20000)
        .select(when(col("id") < 18000, 0L).otherwise(col("id") % 97)
          .as("k"), col("id").as("payload"))
      val build = spark.range(0, 97)
        .select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = probe.join(build, "k")
      val p = finalPlan(joined)
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("skew=true") || p.contains("skewed"),
        "the hot key's partition must be split by OptimizeSkewedJoin\n" + p)
      // skew replication must not change the join's result
      assert(joined.count() === 20000L)
    }
  }

  test("AQE coalesces an over-partitioned shuffle down to the data size") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "64") {
      val agg = Tables.lineitem(spark, sf0001).groupBy("l_orderkey").count()
      val p = finalPlan(agg)
      assert(p.contains("AQEShuffleRead coalesced"), p)
      assert(agg.rdd.getNumPartitions < 64,
        s"64 requested partitions must coalesce, got ${agg.rdd.getNumPartitions}")
    }
  }

  test("salted join stays result-equal to the plain join under AQE skew handling") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val probe = spark.range(0, 5000)
        .select(when(col("id") < 4500, 0L).otherwise(col("id") % 13)
          .as("k"), col("id").as("payload"))
      val build = spark.range(0, 13)
        .select(col("id").as("k"), (col("id") * 10).as("v"))
      val plain = probe.join(build, probe("k") === build("k"))
        .select(col("payload"), col("v"))
      val salted = operators.SkewOps
        .saltedJoin(probe, build, "k", "k", salts = 4)
        .select(col("payload"), col("v"))
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    }
  }
}
