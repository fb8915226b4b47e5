package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B timer for any two `SparkEntry.queries` entries on one
  * fixture in ONE JVM — the protocol the stress tiers need: the 5M-doc
  * census tier swings ±2× run-to-run WITHIN a JVM
  * (BENCH_spanscrub_tierab_r14.json: 128–266 s for the same query on the
  * same data), so plain re-records can neither detect nor exonerate a 2×
  * regression there. Alternating the two forms A,B,A,B,… in one JVM
  * makes each adjacent pair share its weather; the PAIRED ratios (and
  * their median) are the comparable statistic, not the raw walls.
  *
  * Both queries are warmed once on the smallest oracle fixture first
  * (JIT/codegen, the Bench convention), then timed on the target fixture
  * through the noop sink. Stamps `"protocol":"interleaved_ab"`.
  *
  * Usage: tools/run_main.sh AbProbe <fixtureDir> <queryA> <queryB> [rounds]
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: AbProbe <fixtureDir> <queryA> <queryB> [rounds]")
    val dir = args(0)
    val qa = args(1)
    val qb = args(2)
    val rounds = args.lift(3).map(_.toInt).getOrElse(3)
    Seq(qa, qb).foreach(q => require(SparkEntry.queries.contains(q),
      s"unknown query '$q' — not in SparkEntry.queries"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOn(name: String, fixture: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, fixture)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    runOn(qa, warmDir); runOn(qb, warmDir)

    val pairs = (1 to rounds).map { i =>
      val ta = runOn(qa, dir)
      val tb = runOn(qb, dir)
      System.err.println(f"[abprobe] pair $i: $qa=$ta%.2f s  $qb=$tb%.2f s" +
        f"  ratio=${ta / tb}%.3f")
      (ta, tb)
    }
    val ratios = pairs.map { case (a, b) => a / b }.sorted
    val median =
      if (ratios.size % 2 == 1) ratios(ratios.size / 2)
      else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2.0
    val pairsJson = pairs
      .map { case (a, b) => s"[$a,$b]" }.mkString("[", ",", "]")
    println(s"""{"metric":"ab_probe","sf":"$dir","query_a":"$qa",""" +
      s""""query_b":"$qb","pairs_a_b_sec":$pairsJson,""" +
      s""""ratios_a_over_b":${ratios.mkString("[", ",", "]")},""" +
      s""""median_ratio_a_over_b":$median,""" +
      s""""min_a":${pairs.map(_._1).min},"min_b":${pairs.map(_._2).min},""" +
      s""""protocol":"interleaved_ab"}""")
    spark.stop()
  }
}
