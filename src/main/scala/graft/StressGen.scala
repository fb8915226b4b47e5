package graft

import org.apache.spark.sql.SparkSession

/** Deterministic ~10× stress fixture generator (documents + embeddings
  * only — the LLM-pipeline tables). The sf0.1 fixture caps at 5,000 docs /
  * 2,000 vectors, where several headline ops finish in ~0.3 s and the
  * bench is noise-dominated; this writes 50,000 docs / 20,000 vectors in
  * the same shape (same schemas, same ~50-token vocab text, same iid
  * float32 embeddings) so the √n-cell and bounded-band-bucket scale claims
  * get an empirical datapoint (BENCH_stress10x, cited in PERF.md).
  *
  * Planted structure, all deterministic (seed 42):
  *  - every 500th doc is an EXACT duplicate of its predecessor;
  *  - every 250th (collision-free with the above) is a NEAR duplicate —
  *    one token replaced in a ≥80-token doc, so 3-gram-shingle Jaccard
  *    ≈ (S−3)/(S+3) ≥ 0.92, above the 0.9 pipeline threshold;
  *  - every 400th embedding is its predecessor plus tiny noise
  *    (cosine ≈ 0.999, far above the 0.45 threshold);
  * so dedup/near-dup/incremental results are non-trivial at this scale
  * the way they are on the shipped fixtures.
  *
  * NOT an oracle fixture: correctness stays gated on /root/testdata (the
  * driver's DuckDB compare). This data exists to measure throughput.
  */
object StressGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/stressdata")
    val docCount = args.lift(1).map(_.toInt).getOrElse(50000)
    val vecCount = args.lift(2).map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val vocab = Array("spark", "batch", "line", "column", "order", "small",
      "sort", "fast", "value", "scan", "hash", "slow", "group", "query",
      "table", "vector", "part", "agg", "stream", "filter", "customer",
      "key", "window", "join", "the", "a", "g", "shuffle", "broadcast",
      "codegen", "parquet", "schema", "plan", "stage", "task", "executor",
      "driver", "merge", "bucket", "skew")
    val langs = Array("en", "en", "en", "en", "zh", "es", "fr", "de")
    val rnd = new scala.util.Random(42)

    def baseText(minLen: Int): String = {
      val len = minLen + rnd.nextInt(60)
      Array.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    // generation is driver-side (≈30 MB of text — a one-time tooling run,
    // not a query path) and parallelized for the write
    val docs = new Array[(Long, String, String, String, Long)](docCount)
    var i = 0
    while (i < docCount) {
      val exactDup = i % 500 == 1 && i > 0
      val nearDup = !exactDup && i % 250 == 1 && i > 0
      val text =
        if (exactDup) docs(i - 1)._2
        else if (nearDup) {
          val toks = docs(i - 1)._2.split(" ")
          toks(toks.length / 2) = "mutated"
          toks.mkString(" ")
        } else baseText(if ((i + 1) % 250 == 1) 80 else 20)
      docs(i) = (i.toLong, text, langs(rnd.nextInt(langs.length)),
        s"src${rnd.nextInt(20)}", text.length.toLong)
      i += 1
    }
    spark.createDataset(docs.toIndexedSeq)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val vecs = new Array[(Long, Array[Float], Int)](vecCount)
    i = 0
    while (i < vecCount) {
      val emb =
        if (i % 400 == 1 && i > 0)
          vecs(i - 1)._2.map(x => x + (rnd.nextGaussian() * 0.02).toFloat)
        else Array.fill(64)(rnd.nextGaussian().toFloat)
      vecs(i) = (i.toLong, emb, rnd.nextInt(10))
      i += 1
    }
    spark.createDataset(vecs.toIndexedSeq)
      .toDF("vec_id", "embedding", "label")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // 10× events (1M rows / 15k users over 30 days, the sf0.1 shape ×10):
    // gives the event-analytics module (sessionize, funnel, retention,
    // SCD2, CDC diff, heavy hitters) a stress datapoint. `ts` is written
    // as raw NANOS (LongType) — the same value `Tables.events` derives
    // from the harness fixture's TIMESTAMP(NANOS) column, so the loader
    // path is identical.
    val evCount = args.lift(3).map(_.toInt).getOrElse(1000000)
    // fixture's ≈66 events/user density; floored so tiny explicit counts
    // can't zero the user pool (rnd.nextInt(0) throws)
    val evUsers = math.max(1, evCount / 66)
    // arg 5: hot-user percentage for the SKEW tier (default 0 =
    // uniform, the historical shape). When h > 0, user 0 receives h %
    // of ALL events (a single power-law head key ~1000× the average —
    // the realistic 100× hazard for every user_id exchange), users
    // 1..10 share a further 20 %, and the rest stay uniform.
    val hotPct = args.lift(5).map(_.toInt).getOrElse(0)
    val types = Array("signup", "purchase", "view", "click", "error")
    val baseNs = 1704067200000000000L // 2024-01-01T00:00:00Z
    val monthNs = 30L * 24 * 3600 * 1000000000L
    val evs = new Array[(Long, Long, Long, String, Double, String)](evCount)
    i = 0
    while (i < evCount) {
      // floorMod, not abs-then-%: abs(Long.MinValue) is still negative
      val ts = baseNs + math.floorMod(rnd.nextLong(), monthNs)
      val user =
        if (hotPct > 0) {
          val r = rnd.nextInt(100)
          if (r < hotPct) 0L
          else if (r < hotPct + 20) 1L + rnd.nextInt(10)
          else rnd.nextInt(evUsers).toLong
        } else rnd.nextInt(evUsers).toLong
      evs(i) = (i.toLong, ts, user,
        types(rnd.nextInt(types.length)),
        rnd.nextDouble() * 560.0, s"""{"k": ${rnd.nextInt(100)}}""")
      i += 1
    }
    spark.createDataset(evs.toIndexedSeq)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // ---- relational star at `relX`× the sf0.1 shape (default 10×:
    // lineitem 6M / orders 1.5M / customer 150k / supplier 10k / part
    // 200k) so the join/agg/window/tpch families get a stress datapoint
    // too. Unlike the text tables above, generation is DISTRIBUTED:
    // spark.range + xxhash64-derived columns — deterministic (seeded
    // hashes of the row id, no RNG state), embarrassingly parallel, and
    // the exact pattern a 100 TB fixture build would use. Value domains
    // mirror the shipped fixtures (same dimension literals the tpch
    // shapes filter on: ASIA/AMERICA, BUILDING, ECONOMY, NATION_k), so
    // every relational query runs unmodified against the stress dir.
    val relX = args.lift(4).map(_.toInt).getOrElse(10)
    if (relX > 0) {
      val nCust = 15000L * relX
      val nSupp = 1000L * relX
      val nPart = 20000L * relX
      val nOrders = 150000L * relX
      val nLine = 600000L * relX
      def write(df: org.apache.spark.sql.DataFrame, name: String): Unit =
        df.repartition(16).write.mode("overwrite")
          .parquet(s"$out/$name.parquet")
      write(spark.range(5).selectExpr(
        "CAST(id AS INT) AS r_regionkey",
        "element_at(array('AFRICA','AMERICA','ASIA','EUROPE'," +
          "'MIDDLE EAST'), CAST(id + 1 AS INT)) AS r_name"), "region")
      write(spark.range(25).selectExpr(
        "CAST(id AS INT) AS n_nationkey",
        "concat('NATION_', id) AS n_name",
        "CAST(id % 5 AS INT) AS n_regionkey"), "nation")
      write(spark.range(nCust).selectExpr(
        "id AS c_custkey",
        "format_string('Customer#%09d', id) AS c_name",
        "CAST(pmod(xxhash64(id, 21), 25) AS INT) AS c_nationkey",
        "CAST(round(-1000.0 + pmod(xxhash64(id, 22), 1100000) / 100.0, 2)" +
          " AS DOUBLE) AS c_acctbal",
        "element_at(array('AUTOMOBILE','BUILDING','FURNITURE'," +
          "'HOUSEHOLD','MACHINERY')," +
          " CAST(pmod(xxhash64(id, 23), 5) + 1 AS INT)) AS c_mktsegment"),
        "customer")
      write(spark.range(nSupp).selectExpr(
        "id AS s_suppkey",
        "format_string('Supplier#%09d', id) AS s_name",
        "CAST(pmod(xxhash64(id, 31), 25) AS INT) AS s_nationkey",
        "CAST(round(-1000.0 + pmod(xxhash64(id, 32), 1100000) / 100.0, 2)" +
          " AS DOUBLE) AS s_acctbal"), "supplier")
      write(spark.range(nPart).selectExpr(
        "id AS p_partkey",
        "concat(element_at(array('blue','red','old','new','hot','cold'," +
          "'large','small'), CAST(pmod(xxhash64(id, 41), 8) + 1 AS INT))," +
          " ' ', element_at(array('ring','bolt','case','drum','plate')," +
          " CAST(pmod(xxhash64(id, 42), 5) + 1 AS INT))) AS p_name",
        "concat('Brand#', pmod(xxhash64(id, 43), 20)) AS p_brand",
        "element_at(array('ECONOMY','LARGE','MEDIUM','PROMO','SMALL'," +
          "'STANDARD'), CAST(pmod(xxhash64(id, 44), 6) + 1 AS INT))" +
          " AS p_type",
        "CAST(pmod(xxhash64(id, 45), 50) + 1 AS INT) AS p_size",
        "CAST(round(900.0 + pmod(xxhash64(id, 46), 9990) / 100.0, 2)" +
          " AS DOUBLE) AS p_retailprice"), "part")
      write(spark.range(nOrders).selectExpr(
        "id AS o_orderkey",
        s"pmod(xxhash64(id, 51), ${nCust}L) AS o_custkey",
        "element_at(array('F','O','P')," +
          " CAST(pmod(xxhash64(id, 52), 3) + 1 AS INT)) AS o_orderstatus",
        "CAST(round(1000.0 + pmod(xxhash64(id, 53), 49900000) / 100.0, 2)" +
          " AS DOUBLE) AS o_totalprice",
        "CAST(date_add(DATE'1995-01-01'," +
          " CAST(pmod(xxhash64(id, 54), 2400) AS INT)) AS TIMESTAMP)" +
          " AS o_orderdate",
        "element_at(array('1-URGENT','2-HIGH','3-MEDIUM'," +
          "'4-NOT SPECIFIED','5-LOW')," +
          " CAST(pmod(xxhash64(id, 55), 5) + 1 AS INT))" +
          " AS o_orderpriority"), "orders")
      write(spark.range(nLine).selectExpr(
        "id DIV 4 AS l_orderkey",
        s"pmod(xxhash64(id, 61), ${nPart}L) AS l_partkey",
        s"pmod(xxhash64(id, 62), ${nSupp}L) AS l_suppkey",
        "CAST(id % 4 + 1 AS INT) AS l_linenumber",
        "CAST(pmod(xxhash64(id, 63), 50) + 1 AS DOUBLE) AS l_quantity",
        "CAST(round(900.0 + pmod(xxhash64(id, 64), 10410000) / 100.0, 2)" +
          " AS DOUBLE) AS l_extendedprice",
        "CAST(pmod(xxhash64(id, 65), 11) / 100.0 AS DOUBLE) AS l_discount",
        "CAST(pmod(xxhash64(id, 66), 9) / 100.0 AS DOUBLE) AS l_tax",
        "element_at(array('A','N','R')," +
          " CAST(pmod(xxhash64(id, 67), 3) + 1 AS INT)) AS l_returnflag",
        "element_at(array('F','O')," +
          " CAST(pmod(xxhash64(id, 68), 2) + 1 AS INT)) AS l_linestatus",
        "CAST(date_add(DATE'1995-01-02'," +
          " CAST(pmod(xxhash64(id, 69), 2500) AS INT)) AS TIMESTAMP)" +
          " AS l_shipdate"), "lineitem")
      println(s"[stressgen] wrote relational star at ${relX}x sf0.1 " +
        s"($nLine lineitem / $nOrders orders) to $out")
    }
    // Register the fixture's boundary constants NEXT TO the data
    // (Tables.snapshotBoundary / vectorCount read this): a snapshot
    // boundary is config — the generator that decided the id space is
    // the thing that knows it, so it ships the constant and the
    // driver-side max() probe stays the cold path everywhere.
    val meta = new java.util.Properties()
    meta.setProperty("documents.maxId", (docCount - 1).toString)
    meta.setProperty("embeddings.maxId", (vecCount - 1).toString)
    val metaOut = new java.io.FileWriter(
      s"$out/${Tables.fixtureMetaFile}")
    try meta.store(metaOut, "graft fixture boundary constants (StressGen)")
    finally metaOut.close()
    println(s"[stressgen] wrote $docCount docs + $vecCount vectors + " +
      s"$evCount events to $out")
    spark.stop()
  }
}
