package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-benchmark for the SEGMENTED running-window plan in its design
  * regime — hot keys. The stress fixture's orders are re-keyed to 3
  * customers (`o_custkey % 3`), so the plain window form must sort
  * ~n/3-row partitions in single tasks, while the segmented form
  * ([[graft.operators.WindowOps.runningSumSegmented]]'s shape) keys the
  * event-volume window on (customer, order-month) and carries balances
  * over the tiny month grid. Answer equality is required before any
  * timing (the TopKBench contract: a fast wrong plan is not a result).
  *
  * One JSON line: `{"metric":"segwin_hot","window":s,"segmented":s,...}`
  * best-of-N (default 3).
  */
object SegWinBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/stressdata")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val hotKeys = sys.env.getOrElse("SPARK_GRAFT_HOT_KEYS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def base: DataFrame = Tables.orders(spark, sfDir)
      .select((col("o_custkey") % hotKeys).as("k"), col("o_orderkey"),
        col("o_orderdate"),
        expr("CAST(o_totalprice AS DECIMAL(18,2))").as("price"))

    def windowForm: DataFrame = {
      val w = Window.partitionBy(col("k"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.withColumn("running", sum(col("price")).over(w).cast("double"))
        .select(col("k"), col("o_orderkey"), col("running"))
    }

    def segmentedForm: DataFrame = {
      val o = base.withColumn("seg",
        year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
      val wSeg = Window.partitionBy(col("k"), col("seg"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val within = o.withColumn("w_sum", sum(col("price")).over(wSeg))
      val wPrefix = Window.partitionBy(col("k")).orderBy(col("seg"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carried = o.groupBy(col("k"), col("seg"))
        .agg(sum(col("price")).as("seg_total"))
        .withColumn("carry", sum(col("seg_total")).over(wPrefix))
        .select(col("k"), col("seg"), col("carry"))
      within.join(carried, Seq("k", "seg"))
        .withColumn("running",
          (col("w_sum") +
            coalesce(col("carry"), lit(0).cast("decimal(18,2)")))
            .cast("double"))
        .select(col("k"), col("o_orderkey"), col("running"))
    }

    def time(mk: () => DataFrame): Seq[Double] = (1 to nRuns).map { _ =>
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val w = windowForm.collect().map(_.toSeq.mkString("|")).sorted
    val g = segmentedForm.collect().map(_.toSeq.mkString("|")).sorted
    require(w.sameElements(g),
      s"segmented != window on the hot-key frame (${w.length} vs ${g.length})")

    time(() => windowForm); time(() => segmentedForm) // warm-up
    val wr = time(() => windowForm)
    val gr = time(() => segmentedForm)
    val rows = base.count()
    println(s"""{"metric":"segwin_hot","rows":$rows,"hot_keys":$hotKeys,""" +
      s""""window":${wr.min},"segmented":${gr.min},""" +
      s""""speedup":${wr.min / gr.min},""" +
      s""""window_runs":[${wr.mkString(",")}],""" +
      s""""segmented_runs":[${gr.mkString(",")}]}""")
    spark.stop()
  }
}
