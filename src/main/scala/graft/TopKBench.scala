package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-benchmark for the native bounded-heap top-k-per-group operator
  * in its DESIGN regime — hot groups. Top-3 lineitems by extendedprice
  * per `l_returnflag`: 3 groups over the whole fact table, so the window
  * form must shuffle EVERY row to 3 reducers and full-sort
  * millions-of-row groups, while the native partial pass caps the
  * exchange at 3 · 3 · partitions rows. (The per-customer query in the
  * main bench is the operator's WORST case — tiny groups — and the main
  * bench reports it honestly; this main records the case the operator
  * exists for. Both shapes appear in PERF.md.)
  *
  * One JSON line: `{"metric":"topk_hot","window":s,"native":s,...}`,
  * best-of-N (default 3) with all runs recorded.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/stressdata")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def base: DataFrame = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("tie"))

    def windowForm: DataFrame = base
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice").desc, col("tie"))))
      .filter(col("rn") <= 3).drop("rn")

    def nativeForm: DataFrame = graft.plans.TopKPerGroup(base,
      Seq("l_returnflag"), "l_extendedprice", descending = true, "tie", 3)

    def time(mk: () => DataFrame): Seq[Double] = (1 to nRuns).map { _ =>
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // answer equality first — a fast wrong operator is not a result
    val w = windowForm.collect().map(_.toSeq.mkString("|")).sorted
    val n = nativeForm.collect().map(_.toSeq.mkString("|")).sorted
    require(w.sameElements(n),
      s"native != window on the hot-group frame (${w.length} vs ${n.length})")

    time(() => windowForm); time(() => nativeForm) // warm-up
    val wr = time(() => windowForm)
    val nr = time(() => nativeForm)
    val line = s"""{"metric":"topk_hot","unit":"sec","rows":${base.count()},""" +
      s""""window":${wr.min},"native":${nr.min},""" +
      s""""window_runs":${wr.mkString("[", ",", "]")},""" +
      s""""native_runs":${nr.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    spark.stop()
  }
}
