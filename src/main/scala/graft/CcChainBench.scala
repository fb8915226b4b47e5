package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-count probe for the connected-components implementations on a
  * planted LONG-CHAIN graph — the adversarial diameter case for CC on
  * near-dup doc graphs (crawl-scale boilerplate chains form long paths,
  * so an algorithm whose rounds grow with component diameter is
  * unbounded by design there).
  *
  * Measures, on a path graph of `n` docs (diameter n−1):
  *   - min-label + pointer-jump (the shipped [[graft.operators.DedupOps
  *     .clustersFromEdges]] loop): rounds + wall;
  *   - large-star/small-star contraction (Kiveris et al.): rounds + wall;
  *   - plain min-label WITHOUT the jump, on a small chain only (its
  *     rounds = diameter — the contrast the O(log d) claim is measured
  *     against; running it at the full n would take ~n rounds).
  *
  * Both full-scale forms must label every node 0 (one component of size
  * n) before any timing is printed. One JSON line to stdout.
  *
  * Usage: tools/run_main.sh CcChainBench [n] [nojumpN]
  */
object CcChainBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val nojumpN = args.lift(1).map(_.toInt).getOrElse(128)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def chain(k: Int) = spark.range(k - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))

    def runForm(name: String, k: Int,
        f: org.apache.spark.sql.DataFrame => (org.apache.spark.sql.DataFrame, Int))
        : String = {
      // warm-up on a tiny chain so JIT/codegen never lands in run 1
      f(chain(32))._1.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      val (df, rounds) = f(chain(k))
      val rows = df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      require(rows.length == k, s"$name: ${rows.length} rows, expected $k")
      require(rows.forall(_.getAs[Long]("cluster_id") == 0L),
        s"$name: some node not labeled by the component min")
      require(rows.forall(_.getAs[Long]("cluster_size") == k.toLong),
        s"$name: wrong cluster size")
      System.err.println(f"[ccchain] $name n=$k rounds=$rounds sec=$sec%.2f")
      s""""$name":{"n":$k,"rounds":$rounds,"sec":$sec}"""
    }

    import graft.operators.DedupOps
    val jump = runForm("minlabel_jump", n,
      e => DedupOps.clustersFromEdgesCounted(e, roundCap = 40))
    val lss = runForm("large_small_star", n,
      e => DedupOps.clustersLargeSmallStar(e, roundCap = 40))
    val nojump = runForm("minlabel_nojump", nojumpN,
      e => DedupOps.clustersFromEdgesCounted(e, roundCap = 2 * nojumpN,
        jump = false))
    println(s"""{"metric":"cc_chain","n":$n,"diameter":${n - 1},""" +
      s"""$jump,$lss,$nojump}""")
    spark.stop()
  }
}
