package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost probe for the `llm_ann_pq8` family (round-18 optimization
  * measurement): times codebook training, the corpus encode, and the
  * full ADC query separately through the noop sink, RUNS each stage N
  * times and prints one JSON line — so "where do pq8's seconds go" has
  * a recorded answer instead of a guess.
  */
object PqStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Seq[Double] = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(s"[pqstage] $tag: ${ts.map(t => f"$t%.3f").mkString(",")}")
      ts
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm-up: one full query
    noop(operators.SimOps.annPq8(spark, sfDir))
    val r = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    r("codebook") = time("codebook") {
      operators.SimOps.pq8Codebook(spark, sfDir); ()
    }
    val cb = operators.SimOps.pq8Codebook(spark, sfDir)
    r("encode") = time("encode") {
      noop(operators.SimOps.pq8Encoded(spark, sfDir, cb))
    }
    r("join_only") = time("join_only") {
      noop(operators.SimOps.pq8JoinOnlyProbe(spark, sfDir, cb))
    }
    r("scan_adc") = time("scan_adc") {
      noop(operators.SimOps.pq8AdcScanProbe(spark, sfDir, cb))
    }
    r("full_query") = time("full_query") {
      noop(operators.SimOps.annPq8(spark, sfDir))
    }
    val js = r.map { case (k, v) =>
      "\"" + k + "\":[" + v.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"pq8_stages","runs":$js,"sf":"$sfDir"}""")
    spark.stop()
  }
}
