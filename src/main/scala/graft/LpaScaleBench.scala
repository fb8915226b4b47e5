package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** LPA + modularity at planted-community scale (r15 verdict item 5):
  * the oracled queries run on the ≤25-node nation graph with BROADCAST
  * label frames, and the docs promise "at web scale a shuffle join
  * keyed by node" — this bench proves the shuffle form on the real
  * machinery ([[GraphOps.lpaRounds]] / [[GraphOps.modularityOf]], the
  * code the queries call) over a planted clique graph ~50,000× the
  * nation graph's node count:
  *
  *   - nCliques cliques of `cliqueSize` nodes (default 60,000 × 20 =
  *     1.2M nodes, 11.4M intra edges) plus one bridge edge between
  *     consecutive cliques — sparse inter-community noise a 3-round
  *     synchronous LPA must NOT let leak labels across;
  *   - the planted partition is the known fixpoint: every clique
  *     converges to its min label in round 1 (19 intra votes vs ≤ 1
  *     bridge vote) — the bench ASSERTS both dispatch forms emit
  *     exactly that labeling before recording any wall;
  *   - broadcast and shuffle forms both run; node count sits above
  *     [[GraphOps.lpaBroadcastMaxNodes]] so [[GraphOps.lpaAuto]]'s
  *     dispatch (breadcrumb on stderr) picks shuffle;
  *   - [[GraphOps.modularityOf]] scores the emitted partition in the
  *     shuffle form; Q ≈ 1 − 1/nCliques − (degree terms) on this
  *     fixture, a high-modularity sanity gate (require Q > 0.9).
  *
  * Usage: tools/run_main.sh LpaScaleBench [nCliques] [cliqueSize]
  */
object LpaScaleBench {
  def main(args: Array[String]): Unit = {
    val nCliques = args.headOption.map(_.toInt).getOrElse(60000)
    val cliqueSize = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = nCliques.toLong * cliqueSize

    // planted clique graph, generated distributed (range + self-join
    // keyed by clique id — never a driver-side array)
    val members = spark.range(n)
      .select((col("id") / cliqueSize).cast("long").as("c"),
        col("id").as("u"))
    val intra = members.join(
        members.select(col("c"), col("u").as("v")), "c")
      .filter(col("u") < col("v"))
      .select(col("u").as("a"), col("v").as("b"))
    val bridges = spark.range(nCliques - 1L)
      .select((col("id") * cliqueSize).as("a"),
        ((col("id") + 1L) * cliqueSize).as("b"))
    val strong = intra.unionByName(bridges)
      .transform(Checkpoints.truncate)
    val nEdges = strong.count()
    val sym = strong.select(col("a").as("u"), col("b").as("v"))
      .unionByName(strong.select(col("b").as("u"), col("a").as("v")))
      .transform(Checkpoints.truncate)
    val nodes = spark.range(n).select(col("id").as("node"))

    // the planted fixpoint every form must reproduce: min label per clique
    def assertPlanted(lbl: DataFrame): Unit = {
      val bad = lbl.filter(
        col("lbl") =!= (col("node") / cliqueSize).cast("long") *
          cliqueSize).count()
      require(bad == 0, s"$bad nodes off the planted labeling")
    }
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // warm-up (unrecorded): JIT + codegen compile — the first LPA pass
    // on a cold JVM measured 34 s where the steady state is ~10 s
    GraphOps.lpaRounds(nodes, sym, rounds = 1, broadcastLabels = true)
      .write.format("noop").mode("overwrite").save()

    // best-of-2 per form, every run recorded (the Bench stance)
    def best2(f: => DataFrame): (Double, Seq[Double], DataFrame) = {
      val (t1, _) = timed { assertPlanted(f) }
      val (t2, r) = timed {
        val l = f.transform(Checkpoints.truncate); assertPlanted(l); l
      }
      (math.min(t1, t2), Seq(t1, t2), r)
    }
    val (tShuffle, runsShuffle, lblShuffle) = best2(
      GraphOps.lpaRounds(nodes, sym, rounds = 3, broadcastLabels = false))
    val (tBcast, runsBcast, _) = best2(
      GraphOps.lpaRounds(nodes, sym, rounds = 3, broadcastLabels = true))
    // the dispatch itself: 1.2M nodes > the 1M bar -> shuffle (breadcrumb)
    val (tAuto, runsAuto, _) = best2(GraphOps.lpaAuto(nodes, sym))
    val (tMod, qs) = timed {
      // Q from the EXACT per-community terms: Σe_c/m − Σd_c²/(2m)².
      // Summing the emitted q_micro instead accumulates the
      // per-community half-micro rounding bias (~+0.42 micro × 60k
      // communities ≈ +0.025 — enough to print an impossible Q > 1);
      // the micro quantization exists for ORACLE parity, not for
      // 60k-term summation.
      val r = GraphOps.modularityOf(lblShuffle, strong,
        broadcastLabels = false)
        .agg(count(lit(1)).as("nc"), sum(col("e_c")).as("se"),
          sum(col("d_c") * col("d_c")).as("sd2"),
          sum(col("q_micro")).as("qmicro"))
        .collect()(0)
      require(r.getLong(0) == nCliques.toLong,
        s"${r.getLong(0)} communities, expected $nCliques")
      val m = nEdges.toDouble
      (r.getLong(1) / m - r.getLong(2) / (4.0 * m * m),
        r.getLong(3).toDouble / 1e6)
    }
    val (q, qMicroSum) = qs
    require(q > 0.9 && q <= 1.0, s"planted-clique modularity $q")

    def arr(ts: Seq[Double]) = ts.mkString("[", ",", "]")
    println(s"""{"metric":"lpa_scale","n_nodes":$n,"n_cliques":$nCliques,""" +
      s""""clique_size":$cliqueSize,"n_edges":$nEdges,"rounds":3,""" +
      s""""sec_lpa_shuffle":$tShuffle,"runs_shuffle":${arr(runsShuffle)},""" +
      s""""sec_lpa_broadcast":$tBcast,"runs_broadcast":${arr(runsBcast)},""" +
      s""""sec_lpa_auto":$tAuto,"runs_auto":${arr(runsAuto)},""" +
      s""""auto_dispatch":"shuffle",""" +
      s""""sec_modularity_shuffle":$tMod,"modularity_q":$q,""" +
      s""""modularity_q_micro_sum":$qMicroSum,""" +
      s""""planted_labeling_exact":true}""")
    spark.stop()
  }
}
