package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-layout scale levers, demonstrated and plan-audited: bucketing
  * (co-located joins with NO exchange on either side) and date
  * partitioning (partition pruning at the source). At 100 TB these are the
  * difference between a shuffle of the fact table and none at all.
  */
class StorageLayoutSpec extends SparkSpec {

  test("bucketed tables join without any shuffle exchange") {
    // tables land in the default warehouse (spark-warehouse/, gitignored);
    // drop metadata AND stale physical dirs from any earlier aborted run
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    Seq("li_b", "ord_b").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(wh, t))
    }
    Tables.lineitem(spark, sf0001)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    Tables.orders(spark, sf0001)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    // disable broadcast so the join itself must pick a strategy
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      // inspect only the AQE final plan (toString appends the initial one)
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), p)
      assert("Bucketed: true".r.findAllIn(p).length === 2, p)
      // the ONLY exchange is the post-join aggregation shuffle — nothing
      // below the join repartitions the bucketed sides
      val joinPart = p.substring(p.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$p")
      // same join on plain parquet DOES shuffle both sides
      val unbucketed = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      unbucketed.collect()
      val p2 = unbucketed.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(p2).length >= 2, p2)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  // The incremental-pipeline scenario: a bucketed fact table APPENDED to
  // daily must keep its layout, or every downstream colocated join
  // silently regains its shuffle. saveAsTable(Append) on an existing
  // bucketed table writes the new files under the SAME bucket spec
  // (hash(l_orderkey) % 4), so the join stays exchange-free after any
  // number of append batches — the property that makes bucketing viable
  // for a continuously-ingesting 100 TB fact, not just a one-shot load.
  test("appending to a bucketed table preserves the shuffle-free join") {
    spark.sql("DROP TABLE IF EXISTS li_app")
    spark.sql("DROP TABLE IF EXISTS ord_app")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    Seq("li_app", "ord_app").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(wh, t))
    }
    val li = Tables.lineitem(spark, sf0001)
    // initial load: orders < 800 — the "yesterday" partition of the fact
    li.filter(col("l_orderkey") < 800)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_app")
    // daily append: today's slice, SAME bucket spec via Append mode
    li.filter(col("l_orderkey") >= 800)
      .write.mode("append").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_app")
    Tables.orders(spark, sf0001)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_app")
    assert(spark.table("li_app").count() === li.count(),
      "append must not lose rows")
    val joined = spark.table("li_app")
      .join(spark.table("ord_app"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), p)
      val joinPart = p.substring(p.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"appended bucketed join must stay shuffle-free:\n$p")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  // The dedup store's scale lever: snapshotArtifacts persisted bucketed on
  // digest lets the incremental exact-join run with NO store-side shuffle
  // even when the batch is too big to broadcast — only the batch
  // repartitions to match the store's layout.
  test("digest-bucketed dedup store joins shuffle the batch only") {
    import graft.operators.DedupOps
    spark.sql("DROP TABLE IF EXISTS dedup_store_b")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(wh, "dedup_store_b"))
    val docs = Tables.documents(spark, sf0001)
    DedupOps.snapshotArtifacts(spark, docs.filter(col("doc_id") < 400))
      .write.bucketBy(4, "digest").sortBy("digest")
      .saveAsTable("dedup_store_b")
    val batchDig = DedupOps
      .snapshotArtifacts(spark, docs.filter(col("doc_id") >= 400))
      .select(col("doc_id"), col("digest"))
    val joined = batchDig.join(
      spark.table("dedup_store_b").select(col("doc_id").as("p_id"),
        col("digest")), "digest")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      // exactly one exchange: the batch repartitioning to the store's
      // bucket layout — the store side reads in place
      assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
        s"only the batch side may shuffle:\n$p")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  // The embedding store's version of the same lever: the exploded probe
  // assignments persisted bucketed on cell let the incremental candidate
  // join read the store in place — only the batch side shuffles.
  test("cell-bucketed embed store joins shuffle the batch only") {
    import graft.operators.SimOps
    spark.sql("DROP TABLE IF EXISTS embed_store_b")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(wh, "embed_store_b"))
    val k = Tables.snapshotBoundary(spark, sf0001, "embeddings")
    val emb = Tables.embeddings(spark, sf0001)
    val seeds = SimOps.seedsFromArtifact(
      SimOps.quantizerArtifact(spark, sf0001, SimOps.dedupCells))
    SimOps.artifactAssigned(
        SimOps.embedSnapshotArtifacts(spark, emb.filter(col("vec_id") < k),
          seeds))
      .write.bucketBy(4, "cell").sortBy("cell")
      .saveAsTable("embed_store_b")
    val batch = SimOps.artifactAssigned(
      SimOps.embedSnapshotArtifacts(spark, emb.filter(col("vec_id") >= k),
        seeds))
      .select(col("cell"), col("vec_id").as("vb"),
        col("embedding").as("emb_b"), col("norm").as("norm_b"))
    val joined = batch.join(
      spark.table("embed_store_b").select(col("cell"),
        col("vec_id").as("va")), "cell")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      // exactly one exchange: the batch repartitioning to the store's
      // bucket layout — the store side reads in place
      assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
        s"only the batch side may shuffle:\n$p")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  // The LSH serving layout claimed in SimOps.srpTableArtifact's doc: the
  // persisted SRP table bucketed on (band, bucket) serves query batches
  // too big to broadcast with NO store-side shuffle — only the query
  // batch repartitions to the table's layout.
  test("band-bucket-bucketed SRP table serves large query batches with " +
    "no store-side shuffle") {
    import graft.operators.SimOps
    spark.sql("DROP TABLE IF EXISTS srp_store_b")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(wh, "srp_store_b"))
    SimOps.srpTableArtifact(spark, sf0001)
      .write.bucketBy(4, "band", "bucket").sortBy("band", "bucket")
      .saveAsTable("srp_store_b")
    // a query batch that must NOT broadcast (threshold disabled below)
    val qs = SimOps.srpTableArtifact(spark, sf0001)
      .filter(col("vec_id") < 20)
      .select(col("band"), col("bucket"), col("vec_id").as("q_id"))
    val joined = qs.join(spark.table("srp_store_b")
      .select(col("band"), col("bucket"), col("vec_id")),
      Seq("band", "bucket"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
        s"only the query batch may shuffle:\n$p")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("date-partitioned writes enable partition pruning at the scan") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events"
    Tables.events(spark, sf0001)
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .filter(col("day") === "2024-01-15")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    pruned.collect()
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(day"), p)
    // the pruned scan reads only the matching partition's files
    val allDays = spark.read.parquet(dir)
      .select("day").distinct().count()
    assert(allDays > 1, "fixture spans multiple days")
  }

  test("layout_partition_prune (the registered query) prunes at the " +
    "scan and matches an unpartitioned recompute") {
    val df = graft.operators.RelationalOps.partitionPrune(spark, sf0001)
    val p = finalPlan(df)
    assert(p.contains("PartitionFilters: [isnotnull(day"), p)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = Tables.events(spark, sf0001)
      .filter(to_date(col("ts")) === lit("2024-01-07").cast("date"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("user_id")).as("sum_uid"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.sameElements(want))
  }
}
