package graft

import org.apache.spark.sql.SparkSession

/** The spanScrub pathological-doc probe (r13 verdict item 1): one long
  * fully-boilerplate document duplicated across two docs — exactly the
  * input the operator exists to clean — makes the pre-r14 per-token
  * start-list scan Θ(L²) (every token linearly probes ~its own position
  * worth of shared starts before the covering one), while the interval
  * form is Θ(L) (the 50k starts fuse into ONE covered run). Measures
  * both forms on the same frame, asserts they return identical rows,
  * and prints one JSON line for the artifact record.
  *
  * Usage: tools/run_main.sh SpanScrubProbe [nTokens] (default 50000).
  */
object SpanScrubProbe {
  def main(args: Array[String]): Unit = {
    val nToks = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rnd = new scala.util.Random(7)
    val boiler = Array.fill(nToks)("t" + rnd.nextInt(50)).mkString(" ")
    // background docs use per-doc-scoped tokens so they share nothing
    val clean = (0 until 500).map(i =>
      (100L + i, (0 until 100).map(j => s"c${i}w$j").mkString(" ")))
    val docs = (Seq((0L, boiler), (1L, boiler)) ++ clean)
      .toDF("doc_id", "text")
      // spread the two pathological rows across partitions like any
      // real corpus would; the measurement is the per-doc rewrite cost
      .repartition(32).cache()
    docs.count()

    def timeOf(legacy: Boolean): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.DedupOps.spanScrubFrame(docs, legacyProbe = legacy)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    // warm-up (JIT + codegen) on a tiny slice
    graft.operators.DedupOps
      .spanScrubFrame(docs.filter($"doc_id" >= 100L).limit(50))
      .write.format("noop").mode("overwrite").save()

    val secInterval = timeOf(legacy = false)
    val secLegacy = timeOf(legacy = true)
    // value-neutrality at the pathological point, not just on fixtures
    val a = graft.operators.DedupOps.spanScrubFrame(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    val b = graft.operators.DedupOps
      .spanScrubFrame(docs, legacyProbe = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    require(a == b, "interval and legacy probes diverged")
    require(a.find(_._1 == 0L).exists(_._3 == nToks.toLong),
      "pathological doc was not fully scrubbed")
    println(s"""{"metric":"spanscrub_patho","n_tokens":$nToks,""" +
      s""""n_docs":${2 + clean.size},"sec_legacy":$secLegacy,""" +
      s""""sec_interval":$secInterval,""" +
      s""""speedup":${secLegacy / secInterval}}""")
    spark.stop()
  }
}
