package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure probe: the heaviest value-buffering queries
  * (order-statistics percentiles over the 10× fact, the LSH near-dup
  * and connected-components families over the 100× corpus) run under
  * whatever heap the JVM was given (`SPARK_DRIVER_MEM`, build.sbt
  * forwards it to -Xmx), and every query's result CHECKSUM plus the
  * run's spill metrics are printed as one JSON line.
  *
  * The claim under test: a capped heap degrades to DISK SPILL — never
  * an OOM, never a silently different answer. tools/spill_check.sh runs
  * this twice (ample heap, capped heap) and diffs the checksums; the
  * spill counters show the capped run actually exercised the spill
  * path rather than just fitting anyway.
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val relDir = args.headOption.getOrElse("/root/repo/stressdata")
    val docDir = args.lift(1).getOrElse("/root/repo/stressdata100")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    val runs = Seq(
      ("agg_percentile", relDir),
      ("agg_weighted_percentile", relDir),
      ("llm_dedup_near", docDir),
      ("llm_dup_clusters", docDir),
      // r15: the quality gate — perplexity doc-census + spread-rank
      // terciles over the 100× corpus, the newest value-buffering family
      ("llm_quality_buckets", docDir))
    val results = runs.map { case (q, d) =>
      memSpill.set(0); diskSpill.set(0)
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(q)(spark, d).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      require(rows.nonEmpty, s"$q returned 0 rows")
      // order-insensitive deterministic digest of every value
      val checksum = rows.map(_.toString.hashCode.toLong).sum
      Thread.sleep(500) // let the listener bus drain task-end events
      s"""{"query":"$q","rows":${rows.length},"checksum":$checksum,""" +
        s""""sec":$sec,"mem_spill_bytes":${memSpill.get},""" +
        s""""disk_spill_bytes":${diskSpill.get}}"""
    }
    println(s"""{"metric":"spill_probe",""" +
      s""""heap_bytes":${Runtime.getRuntime.maxMemory()},""" +
      s""""queries":[${results.mkString(",")}]}""")
    spark.stop()
  }
}
