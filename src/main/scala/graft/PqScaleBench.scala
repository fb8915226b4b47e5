package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimOps

/** Product-quantization scale probe on a StressGen ANN fixture — the
  * round-17 shape: both codebook families, codegen'd hot loops, and the
  * √n-cell IVF-PQ serving path the r16 verdict demanded.
  *
  * One-off index builds (timed separately — the persisted artifacts a
  * production deployment amortizes):
  *   - 16-code frozen-book encode ([[SimOps.pqEncoded]] fast — now the
  *     codegen'd PqEncode expression);
  *   - 256-code TRAINED book ([[SimOps.pq8Codebook]] driver k-means on
  *     the first 2048 — corpus-size-independent) + encode;
  *   - √n-cell assignment of the 8-bit codes
  *     ([[SimOps.annIvfPqScaled]], two-level compiled argmax).
  *
  * Query-time measurements against those artifacts:
  *   - exact brute force ([[SimOps.simTopk]]) — the bar;
  *   - pure ADC top-5 under both books (wall + iid recall@5) — with
  *     [[graft.functions.PqAdc]] codegen'd, ADC must now BEAT the
  *     brute dot single-host (r16: it lost 6.4 vs 3.7 s at 1M);
  *   - ADC-shortlist + exact re-rank recall under both books;
  *   - IVF-PQ at 32 frozen cells probe-4 (continuity with r16) and at
  *     [[SimOps.scaledCells]] cells with a probe SWEEP (1/2/4/8):
  *     wall + iid recall each;
  *   - planted near-dup recall through the scaled path at probe 4,
  *     GATED ≥ 0.98 (the verdict's bar), plus the legacy 32-cell gate.
  *
  * Usage: tools/run_main.sh PqScaleBench [fixtureDir]
  */
object PqScaleBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/stressdata_ann1m")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val n = Tables.vectorCount(spark, dir)
    val cells = SimOps.scaledCells(n)

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def topSets(df: org.apache.spark.sql.DataFrame)
        : Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // ------------------------------------------- one-off index builds
    val (tEncode, encoded) = timed {
      val e = SimOps.pqEncoded(spark, dir, fast = true)
        .transform(Checkpoints.truncate)
      e.count()
      e
    }
    val (tTrain8, cb8) = timed(SimOps.pq8Codebook(spark, dir))
    val (tEncode8, encoded8) = timed {
      val e = SimOps.pq8Encoded(spark, dir, cb8)
        .transform(Checkpoints.truncate)
      e.count()
      e
    }
    val (tAssign, assigned8) = timed {
      val a = SimOps.annIvfPqScaled(spark, dir, encoded8, cb8, cells)
        .transform(Checkpoints.truncate)
      a.count()
      a
    }

    // ------------------------------------------------------ query time
    val (tBrute, brute) = timed(topSets(SimOps.simTopk(spark, dir)))
    def recall(m: Map[Long, Set[Long]]): Double = brute.keys.toSeq.map {
      q => (brute(q) & m.getOrElse(q, Set.empty)).size.toDouble /
        brute(q).size
    }.sum / brute.size

    val (tAdc, adcSets) =
      timed(topSets(SimOps.annPqOn(spark, dir, encoded)))
    val (tAdc8, adc8Sets) =
      timed(topSets(SimOps.annPqOnCb(spark, dir, encoded8, cb8)))
    val (tRerank, rerankSets) = timed(topSets(
      SimOps.annPqRerank(spark, dir, 50, encodedOpt = Some(encoded))))
    val (tRerank8, rerank8Sets) = timed(topSets(
      SimOps.annPqRerank(spark, dir, 50, encodedOpt = Some(encoded8),
        cbOpt = Some(cb8))))
    val (tIvfPq, ivfPqSets) = timed(topSets(
      SimOps.annIvfPq(spark, dir, probes = 4,
        encodedOpt = Some(encoded))))

    // scaled IVF-PQ probe sweep over the assigned 8-bit store. Each
    // entry warms through the noop sink first (the SrpProbeBench
    // topSets pattern): without it the FIRST sweep entry pays the
    // store's first-touch page-in and JIT and the recorded walls come
    // out non-monotone in probes (the r17 first cut measured probe-2 at
    // 8.1 s and probe-8 at 0.98 s on the same store).
    val sweep = Seq(1, 2, 4, 8).map { p =>
      val q = SimOps.annIvfPqScaledQuery(
        spark, dir, assigned8, cb8, cells, probes = p)
      q.write.format("noop").mode("overwrite").save()
      val (t, sets) = timed(topSets(SimOps.annIvfPqScaledQuery(
        spark, dir, assigned8, cb8, cells, probes = p)))
      (p, t, recall(sets))
    }

    // the composed two-stage serving pipeline: pruned ADC shortlist +
    // exact re-rank (what a deployment actually runs per query batch)
    val (tScaledRerank, scaledRerankSets) = {
      val q = SimOps.annIvfPqScaledRerank(spark, dir, assigned8, cb8,
        cells, probes = 4)
      q.write.format("noop").mode("overwrite").save()
      timed(topSets(SimOps.annIvfPqScaledRerank(spark, dir, assigned8,
        cb8, cells, probes = 4)))
    }

    // planted near-dups: legacy 32-cell gate + the scaled-path gate
    val plantedQs = (1L until n by 4000L).toSeq
    val plantedPred = col("vec_id") % 4000 === 1
    def plantedRecall(m: Map[Long, Set[Long]]): Double =
      plantedQs.count(q =>
        m.getOrElse(q, Set.empty).contains(q - 1)).toDouble /
        plantedQs.size
    val (tPlanted, plRecall) = timed(plantedRecall(topSets(
      SimOps.annIvfPq(spark, dir, probes = 4, queryPred = plantedPred,
        encodedOpt = Some(encoded)))))
    val (tPlantedScaled, plRecallScaled) = timed(plantedRecall(topSets(
      SimOps.annIvfPqScaledQuery(spark, dir, assigned8, cb8, cells,
        probes = 4, queryPred = plantedPred))))
    require(plRecall >= 0.9,
      s"planted IVF-PQ recall $plRecall < 0.9 — the code/cell path " +
        "lost near-identical partners")
    require(plRecallScaled >= 0.98,
      s"planted scaled-IVF-PQ recall $plRecallScaled < 0.98 — the " +
        "two-level assignment split near-identical partners")

    val sweepJson = sweep.map { case (p, t, r) =>
      s"""{"probes":$p,"sec":$t,"recall_iid":$r}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"pq_scale","n_vectors":$n,"subspaces":8,""" +
      s""""codes":16,"codes8":256,"cells_scaled":$cells,""" +
      s""""bytes_per_vector":8,"raw_bytes_per_vector":256,""" +
      s""""sec_encode_fast":$tEncode,"sec_train8":$tTrain8,""" +
      s""""sec_encode8":$tEncode8,"sec_assign_scaled":$tAssign,""" +
      s""""sec_brute":$tBrute,""" +
      s""""sec_adc":$tAdc,"sec_adc8":$tAdc8,""" +
      s""""sec_rerank":$tRerank,"sec_rerank8":$tRerank8,""" +
      s""""sec_ivfpq_probe4":$tIvfPq,""" +
      s""""sweep_scaled":$sweepJson,""" +
      s""""sec_scaled_rerank_p4":$tScaledRerank,""" +
      s""""recall_iid_scaled_rerank":${recall(scaledRerankSets)},""" +
      s""""sec_planted":$tPlanted,"sec_planted_scaled":$tPlantedScaled,""" +
      s""""n_planted_queries":${plantedQs.size},""" +
      s""""recall_iid_adc":${recall(adcSets)},""" +
      s""""recall_iid_adc8":${recall(adc8Sets)},""" +
      s""""recall_iid_rerank":${recall(rerankSets)},""" +
      s""""recall_iid_rerank8":${recall(rerank8Sets)},""" +
      s""""recall_iid_ivfpq":${recall(ivfPqSets)},""" +
      s""""planted_recall_ivfpq":$plRecall,""" +
      s""""planted_recall_ivfpq_scaled":$plRecallScaled}""")
    spark.stop()
  }
}
