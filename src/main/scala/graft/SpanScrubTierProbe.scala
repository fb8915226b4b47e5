package graft

import org.apache.spark.sql.SparkSession

/** A/B timer for the two spanScrub probe forms on a real fixture tier —
  * the dual of [[SpanScrubProbe]] (which measures the planted
  * pathological doc): on a SHORT-DOC corpus the probe stage is a small
  * fraction of the span-census pipeline, so the two forms should tie;
  * this main verifies that the gap-slice rewrite did not tax the common
  * case while fixing the pathological one.
  *
  * Usage: tools/run_main.sh SpanScrubTierProbe <fixtureDir> [runs]
  */
object SpanScrubTierProbe {
  def main(args: Array[String]): Unit = {
    // fixture dir is REQUIRED (sibling benches take it explicitly too —
    // a hardcoded absolute default silently measures the wrong tier when
    // the repo moves or the fixture is regenerated elsewhere)
    val dir = args.headOption.getOrElse(
      sys.error("usage: SpanScrubTierProbe <fixtureDir> [runs]"))
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    def timeOf(legacy: Boolean): Seq[Double] =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.DedupOps.spanScrubFrame(docs, legacyProbe = legacy)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
    // alternate forms so cache/JIT weather hits both equally
    val g1 = timeOf(false); val l1 = timeOf(true)
    val g2 = timeOf(false); val l2 = timeOf(true)
    val g = g1 ++ g2; val l = l1 ++ l2
    println(s"""{"metric":"spanscrub_tier_ab","sf":"$dir",""" +
      s""""runs_gapslice":${g.mkString("[", ",", "]")},""" +
      s""""runs_legacy":${l.mkString("[", ",", "]")},""" +
      s""""min_gapslice":${g.min},"min_legacy":${l.min}}""")
    spark.stop()
  }
}
