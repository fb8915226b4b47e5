package graft

import org.apache.spark.sql.functions._

import graft.operators.{PartSuppOps, SimOps, TextOps}

/** Round-11 additions: the BPE serving path, order-free IVF centroids,
  * and the derived-partsupp uniqueness guard.
  */
class Round11OpsSpec extends SparkSpec {

  test("llm_bpe_apply_served: encode-from-stored-merges equals the " +
    "retrain path row-for-row (parquet round-trip included)") {
    val retrain = TextOps.bpeApply(spark, sf0001).collect()
    val served = TextOps.bpeApplyServed(spark, sf0001).collect()
    assert(retrain.nonEmpty)
    assert(served.length === retrain.length)
    retrain.zip(served).foreach { case (r, s) =>
      assert(r === s, s"doc ${r.getLong(0)}")
    }
  }

  test("bpeApplyFromStore: an explicitly persisted + reloaded merge " +
    "table reproduces bpeApply through an independent store") {
    val out = java.nio.file.Files.createTempDirectory("bpe_spec")
      .resolve("merges.parquet").toString
    TextOps.bpeTrain(spark, sf0001).write.mode("overwrite").parquet(out)
    val fromStore =
      TextOps.bpeApplyFromStore(spark, sf0001, spark.read.parquet(out))
        .collect()
    val retrain = TextOps.bpeApply(spark, sf0001).collect()
    assert(fromStore.toSeq === retrain.toSeq)
  }

  test("annIndex centroids are shuffle-order-independent: fixed-point " +
    "micro-sums give bit-identical centroids at different parallelism") {
    def centroidMap(): Map[Long, Seq[Double]] = {
      val (centroids, _) = SimOps.annIndex(spark, sf0001)
      centroids.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    }
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    val a = centroidMap()
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    val b = try centroidMap()
    finally spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert(a.keySet === b.keySet)
    a.foreach { case (cell, v) =>
      // exact double equality is the point: partition order must not
      // move a single bit of any centroid component
      assert(v === b(cell), s"cell $cell")
    }
  }

  test("partsupp: a fixture with < 4 suppliers fails loudly instead of " +
    "silently emitting duplicate (ps_partkey, ps_suppkey) pairs") {
    val dir = java.nio.file.Files.createTempDirectory("ps_spec").toString
    val s2 = spark
    import s2.implicits._
    Seq(1L, 2L, 3L).toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq(1L, 2L).toDF("s_suppkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val e = intercept[Exception] {
      PartSuppOps.partsupp(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("4 suppliers")),
      s"unexpected error: $e")
  }

  test("partsupp keeps (ps_partkey, ps_suppkey) pairs unique on the " +
    "shipped fixture") {
    val ps = PartSuppOps.partsupp(spark, sf0001)
    val total = ps.count()
    val distinctPairs =
      ps.select(col("ps_partkey"), col("ps_suppkey")).distinct().count()
    assert(total > 0)
    assert(distinctPairs === total)
  }
}
