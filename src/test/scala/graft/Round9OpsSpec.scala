package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, SimOps}

/** Round-9 additions: the ADVICE-driven hardening — convergence-cap
  * off-by-one in connected components, SRP Long bucket weights + the
  * bits-per-band layout parameter traveling with the persisted table.
  */
class Round9OpsSpec extends SparkSpec {

  test("clustersFromEdges: fixpoint reached exactly ON the cap round is " +
    "accepted, not spuriously refused") {
    import spark.implicits._
    // A 2-node path converges in exactly one label-lowering round (node 1
    // takes label 0); the loop's change counter reports changed=1 for
    // that round, so under cap=1 the old `require(changed == 0)` refused
    // a perfectly converged result. The post-cap probe must accept it.
    val edges = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    val rows = DedupOps.clustersFromEdges(edges, roundCap = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert(rows === Map(0L -> 0L, 1L -> 0L))
  }

  test("clustersFromEdges: genuinely unconverged at the cap still fails " +
    "loudly") {
    import spark.implicits._
    // A 60-node path cannot close in one round even with the pointer
    // jump; the post-cap probe must find labels that would still lower
    // and refuse to emit.
    val edges = (0L until 59L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      DedupOps.clustersFromEdges(edges, roundCap = 1).collect()
    }
    assert(e.getMessage.contains("without converging"))
  }

  test("clustersFromEdges: 15 random graphs agree with a driver-side " +
    "union-find (labels, sizes, keepers)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 15).foreach { trial =>
      val n = 2 + rnd.nextInt(40)
      val m = 1 + rnd.nextInt(60)
      // ids sparse and shuffled, not 0..n — labels must not depend on
      // density or contiguity of the id space
      val ids = rnd.shuffle((0 until 200).toList).take(n)
        .map(_.toLong * 7 + 3)
      val edges = Seq.fill(m) {
        val a = ids(rnd.nextInt(n)); val b = ids(rnd.nextInt(n))
        (a, b)
      }.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        // driver union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(ra max rb) = ra min rb
        }
        val members = parent.keys.toSeq
        val expect = members.groupBy(find).flatMap { case (_, ms) =>
          val cid = ms.min
          ms.map(v => v -> (cid, ms.size.toLong, v == cid))
        }
        val got = DedupOps.clustersFromEdges(
          edges.toDF("doc_a", "doc_b")).collect()
          .map(r => r.getAs[Long]("doc_id") ->
            (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
              r.getAs[Boolean]("keeper"))).toMap
        assert(got === expect, s"trial $trial: edges=$edges")
      }
    }
  }

  test("graph_components: partitions all 25 nations, sizes consistent, " +
    "component id is the min member") {
    val rows = graft.operators.GraphOps.components(spark, sf0001).collect()
      .map(r => (r.getAs[Int]("n_nationkey"), r.getAs[Int]("component_id"),
        r.getAs[Long]("component_size")))
    assert(rows.length === 25)
    assert(rows.map(_._1).toSet === (0 until 25).toSet)
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (cid, ms) =>
      assert(ms.map(_._1).min === cid, s"component $cid min is not id")
      assert(ms.forall(_._3 == ms.length), s"component $cid size mismatch")
    }
    assert(rows.map(_._3).sum === byComp.map { case (_, ms) =>
      ms.length.toLong * ms.length }.sum)
  }

  test("win_gaps_islands: driver recount of maximal runs agrees on the " +
    "fixture") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.WindowOps.gapsIslands(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(6)))
    // independent reconstruction: sort each user's events on the driver,
    // collapse consecutive same-type runs, keep length >= 3
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val types = evs.sortBy(e => (e._4, e._2)).map(_._3)
      val runs = scala.collection.mutable.ListBuffer.empty[(String, Int)]
      types.foreach { t =>
        if (runs.nonEmpty && runs.last._1 == t)
          runs(runs.length - 1) = (t, runs.last._2 + 1)
        else runs += ((t, 1))
      }
      runs.filter(_._2 >= 3).map { case (t, n) => (uid, t, n.toLong) }
    }
    assert(got.length == want.length,
      s"${got.length} islands vs driver ${want.length}")
    assert(got.map(r => (r._1, r._2, r._3)).sorted
      .sameElements(want.sorted))
  }

  test("srpBitsPerBand: caps at 62 so Long bucket weights cannot wrap") {
    assert(SimOps.srpBitsPerBand(2000L) === 4) // shipped fixtures frozen
    assert(SimOps.srpBitsPerBand(20000L) === 8)
    // 2^63-1 vectors / 128-target → 2^56 buckets → 56 bits: no Long
    // corpus can push bits past 56 at this target, and the explicit 62
    // cap guards any smaller target. Crucially the old ceil-div overflow
    // (n + 127 wrapping negative) returned 4 here — brute-force bands at
    // the largest corpora. The weight of the top bit stays a positive
    // Long across the whole admissible range.
    assert(SimOps.srpBitsPerBand(Long.MaxValue) === 56)
    (4 to 62).foreach(b => assert((1L << (b - 1)) > 0L))
  }

  test("served query forms equal their standalone recomputes (persisted " +
    "label artifact round-trips)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(DedupOps.clusterKeepBestServed(spark, sf0001)) ===
      rows(DedupOps.clusterKeepBest(spark, sf0001)))
    assert(rows(DedupOps.trainEvalSplitServed(spark, sf0001)) ===
      rows(DedupOps.trainEvalSplit(spark, sf0001)))
    assert(rows(SimOps.annSrpServed(spark, sf0001)) ===
      rows(SimOps.annSrp(spark, sf0001)))
    assert(rows(DedupOps.dupClustersIncrementalServed(spark, sf0001)) ===
      rows(DedupOps.dupClustersIncrementalQuery(spark, sf0001)))
  }

  test("annSrpFromStore: refuses a table missing the bits layout column") {
    val bare = SimOps.srpTableArtifact(spark, sf0001).drop("bits")
    val e = intercept[IllegalArgumentException] {
      SimOps.annSrpFromStore(spark, sf0001, bare)
    }
    assert(e.getMessage.contains("bits"))
  }

  test("clustersFromEdges under a reliable checkpoint dir: identical " +
    "labels, checkpoint files actually written") {
    import spark.implicits._
    val edges = ((0L until 30L).map(i => (i, i + 1)) ++
      Seq((100L, 101L))).toDF("doc_a", "doc_b")
    def labelsOf() = DedupOps.clustersFromEdges(edges).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    val viaLocal = labelsOf()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set("spark.graft.checkpointDir", ckpt)
    try {
      val viaReliable = labelsOf()
      assert(viaReliable === viaLocal)
      val wrote = new java.io.File(
        spark.sparkContext.getCheckpointDir.get.stripPrefix("file:"))
      assert(wrote.getPath.startsWith(ckpt) && wrote.exists(),
        "reliable checkpoint dir was not used")
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
    }
  }

  test("snapshotBoundary: a generator-registered constant wins over the " +
    "data probe; the probe stays the fallback") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_meta").toString
    Seq((0L, "a"), (9L, "b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // no constants file → driver max() probe: boundary = 9*4/5
    assert(Tables.snapshotBoundary(spark, dir, "documents") === 7L)
    // registered constant (deliberately ≠ data max) must win — proving
    // the config path is taken, not the probe
    val dir2 = java.nio.file.Files.createTempDirectory("graft_meta2").toString
    Seq((0L, "a"), (9L, "b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val w = new java.io.FileWriter(s"$dir2/${Tables.fixtureMetaFile}")
    try w.write("documents.maxId=99\n") finally w.close()
    assert(Tables.snapshotBoundary(spark, dir2, "documents") === 79L)
  }

  test("srpTableAppend: store ∪ batch rows equal a full rebuild, and " +
    "the batch is hashed under the STORED bits") {
    val full = SimOps.srpTableArtifact(spark, sf0001)
    val boundary = Tables.snapshotBoundary(spark, sf0001, "embeddings")
    val store = full.filter(col("vec_id") < boundary)
    val appended = SimOps.srpTableAppend(spark, sf0001, store)
    def keyRows(df: org.apache.spark.sql.DataFrame) =
      df.select("band", "bucket", "vec_id", "bits").collect()
        .map(_.toSeq).toSet
    assert(keyRows(store.unionByName(appended)) === keyRows(full))
    // the batch must hash under the STORE's layout, not the
    // corpus-derived one: forge a 5-bit store (the derivation from the
    // 500-vector corpus would say 4) and the appended rows must come
    // back 5-bit — bits column 5, buckets spanning past the 4-bit
    // ceiling of 15
    val forged = store.withColumn("bits", lit(5))
    val rows5 = SimOps.srpTableAppend(spark, sf0001, forged)
      .select("bucket", "bits").collect()
    assert(rows5.nonEmpty && rows5.forall(_.getInt(1) == 5))
    val buckets = rows5.map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < 32))
    assert(buckets.exists(_ > 15),
      "5-bit append never used the top bit — still hashing 4-bit?")
  }

  test("annSrpFromStore: refuses a mixed-bits artifact (two builds " +
    "concatenated)") {
    val t = SimOps.srpTableArtifact(spark, sf0001)
    val mixed = t.unionByName(t.withColumn("bits", lit(9)))
    val e = intercept[IllegalArgumentException] {
      SimOps.annSrpFromStore(spark, sf0001, mixed)
    }
    assert(e.getMessage.contains("mixed-layout"))
  }
}
