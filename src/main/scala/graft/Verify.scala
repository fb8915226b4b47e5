package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Per-query status lands in _status.json so a failed non-oracle query
    // is visible in the round artifacts instead of silently absent.
    // SPARK_GRAFT_ONLY_PREFIX (comma-separated, same contract as Bench)
    // narrows the dump for local iteration; the driver sets no filter.
    val prefixes = sys.env.get("SPARK_GRAFT_ONLY_PREFIX")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      prefixes.isEmpty || prefixes.exists(n.startsWith)
    }
    val status = selected.map { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        name -> "ok"
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        name -> s"error: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json narrows with the same prefix filter as the dumps —
    // otherwise a filtered run could never pass check.py (every
    // unselected oracle would report a missing dump, or worse, compare
    // a stale one from an earlier full run into the same outDir)
    val selectedNames = selected.map(_._1).toSet
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selectedNames(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val statusJson = status
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_status.json"), statusJson)
    if (status.exists(_._2 != "ok")) {
      System.err.println(s"[verify] FAILED queries: " +
        status.filter(_._2 != "ok").map(_._1).mkString(", "))
    }
    spark.stop()
  }
}
