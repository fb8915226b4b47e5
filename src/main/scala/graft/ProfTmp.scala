package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiler — not committed
object ProfTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    // equivalence: native vs declarative chain, value-for-value
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
    val oldCol = expr(
      """array_distinct(
        |  CASE WHEN size(toks) >= 3 THEN
        |    transform(sequence(0, size(toks) - 3),
        |              i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |  ELSE array() END)""".stripMargin)
    val mismatch = docs
      .withColumn("a", oldCol)
      .withColumn("b", expr("graft_shingles(toks)"))
      .filter(not(col("a") <=> col("b")))
      .count()
    println(s"[prof] shingle mismatch rows: $mismatch (expect 0)")
    for (q <- Seq("llm_novelty_rate", "llm_decontaminate", "llm_repetition",
        "llm_dedup_near", "llm_dedup_incremental", "llm_dup_clusters",
        "llm_dup_clusters_incremental", "llm_cluster_keep_best",
        "llm_train_eval_split", "llm_corpus_prepare", "llm_span_dedup",
        "llm_containment", "llm_corpus_clean")) {
      val fn = SparkEntry.queries(q)
      time(s"$q warm")(fn(spark, dir).write.format("noop").mode("overwrite").save())
      time(s"$q     ")(fn(spark, dir).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
