package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line `{"metric":...,"queries":{...}}`.
  *
  * Each query is fully materialized through the `noop` sink (count() would
  * let Catalyst prune the projections being measured). A warm-up pass at
  * the smallest SF first forces JIT + whole-stage-codegen compilation so
  * the measured numbers reflect steady-state execution, not classloading.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir =
      sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // validated before the warm-up spends minutes: a malformed or
    // non-positive run count would otherwise crash late or emit a
    // zero-run JSON that masquerades as an instant full run
    val nRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS") match {
      case None => 2
      case Some(v) =>
        val n = v.toIntOption.getOrElse(
          sys.error(s"SPARK_GRAFT_BENCH_RUNS must be an int, got '$v'"))
        require(n >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $n")
        n
    }
    // optional name-prefix filter (comma-separated), e.g.
    // SPARK_GRAFT_ONLY_PREFIX=llm_,mm_ for the stress tier whose fixture
    // carries only the documents/embeddings tables
    val benched: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      sys.env.get("SPARK_GRAFT_ONLY_PREFIX") match {
        case None => SparkEntry.queries
        case Some(ps) =>
          val prefixes = ps.split(',').map(_.trim).filter(_.nonEmpty)
          val m = SparkEntry.queries.filter { case (n, _) =>
            prefixes.exists(n.startsWith) }
          // a typo'd prefix must fail loudly, not emit a zero-query JSON
          // that masquerades as an instant full run
          require(m.nonEmpty,
            s"SPARK_GRAFT_ONLY_PREFIX='$ps' matches no queries")
          m
      }
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    // warm-up (not measured)
    benched.foreach { case (_, fn) =>
      try runOnce(fn, warmDir) catch { case _: Throwable => () }
    }
    // best-of-N per query (N=2 default) damps GC/JIT noise so
    // round-over-round comparisons track the plan, not the weather — and
    // EVERY individual run lands in the JSON (`runs`) so a "X got faster"
    // claim is auditable against the run-to-run variance instead of
    // resting on an unrecorded best-of. A failed run records null — never
    // its (near-zero) elapsed time, which would masquerade as a speedup.
    val allRuns: Map[String, Seq[Double]] =
      benched.map { case (name, fn) =>
        name -> (1 to nRuns).flatMap { _ =>
          val t0 = System.nanoTime()
          try {
            runOnce(fn, sfDir)
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
          }
        }
      }
    val results: Map[String, Option[Double]] =
      allRuns.map { case (k, ts) => k -> ts.minOption }
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v.fold("null")(_.toString) }
      .mkString("{", ",", "}")
    val runsJson = allRuns.toSeq.sortBy(_._1)
      .map { case (k, ts) => "\"" + k + "\":" + ts.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = results.values.flatten.sum
    val failed = results.collect { case (k, None) => "\"" + k + "\"" }
    val failedJson = failed.mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runsJson,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // The driver's round artifact keeps only a 2000-char stdout TAIL,
    // which truncates away the total and most per-query numbers — so the
    // full line is also written to a file that gets committed
    // (BENCH_full_latest.json by default; override for per-round naming).
    // A PREFIX-FILTERED tier run must never masquerade as the full
    // bench: without an explicit override it lands in
    // BENCH_tier_latest.json instead of clobbering the full record.
    val defaultOut =
      if (sys.env.contains("SPARK_GRAFT_ONLY_PREFIX"))
        "BENCH_tier_latest.json"
      else "BENCH_full_latest.json"
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      line + "\n")
    spark.stop()
  }
}
