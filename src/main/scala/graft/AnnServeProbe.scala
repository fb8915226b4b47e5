package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimOps

/** Serve-path isolation probe: times [[SimOps.annSearchPruned]] RUNS
  * times against the ALREADY-PERSISTED index under <fixtureDir>/ann_index
  * (written by a prior AnnScaleBench run), printing every run — the tool
  * that separates one-time costs (file-index listing, DPP subquery
  * planning, broadcast warm) from per-query work when a serve number
  * moves across a corpus decade.
  *
  * Usage: tools/run_main.sh AnnServeProbe <fixtureDir> [runs]
  */
object AnnServeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.error("usage: AnnServeProbe <fixtureDir> [runs]"))
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val cents = spark.read.parquet(s"$dir/ann_index/centroids")
    val store = spark.read.parquet(s"$dir/ann_index/assigned_bycell")
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") < 20)
      .selectExpr("vec_id AS q_id", "embedding AS q_emb",
        "sqrt(graft_dot(embedding, embedding)) AS q_norm")
    val times = (1 to runs).map { i =>
      val t0 = System.nanoTime()
      val n = SimOps.annSearchPruned(spark, q, cents, store).collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[serveprobe] run $i: $sec%.3f s ($n rows)")
      sec
    }
    println(s"""{"metric":"ann_serve_probe","sf":"$dir",""" +
      s""""runs":${times.mkString("[", ",", "]")},""" +
      s""""min":${times.min},"protocol":"single_jvm"}""")
    spark.stop()
  }
}
