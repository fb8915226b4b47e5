package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Round-13 hygiene additions: the parquet-footer document count that
  * replaced bpeLoop's per-invocation scan, and the attribution-dispatch
  * boundary behavior of [[EventOps.estimatedHotKeyRows]].
  */
class Round13OpsSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  test("Tables.documentsCount (parquet footers, no job) equals a real " +
    "count() at two SFs and is cache-stable") {
    for (dir <- Seq(sf0001, sf001)) {
      val real = Tables.documents(spark, dir).count()
      assert(Tables.documentsCount(spark, dir) === real, s"footer≠scan at $dir")
      // second call hits the (dir, fingerprint) cache — same value
      assert(Tables.documentsCount(spark, dir) === real)
    }
  }

  test("documentsCount re-reads when the fixture at a path is regenerated") {
    val s2 = spark
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("doccount").toString
    def write(n: Int): Unit =
      (0 until n).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
    write(7)
    assert(Tables.documentsCount(spark, dir) === 7L)
    // ensure a distinct mtime so the fingerprint actually changes
    Thread.sleep(1100)
    write(13)
    assert(Tables.documentsCount(spark, dir) === 13L,
      "stale footer count served after fixture regeneration")
  }

  test("spanScrub removes exactly the cross-doc shared 16-token spans: " +
    "planted boilerplate cut, unique prefix/suffix kept, short and " +
    "fully-duplicated docs handled") {
    val s2 = spark
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spanscrub").toString
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ")
    val dup = (1 to 20).map(i => s"d$i").mkString(" ")
    Seq(
      (0L, s"u1 u2 $boiler u3"),     // boilerplate + unique frame
      (1L, s"v1 $boiler v2 v3 v4"),  // same boilerplate elsewhere
      (2L, "tiny doc"),              // < 16 tokens: untouched
      (3L, dup), (4L, dup)           // full duplicates: scrubbed empty
    ).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.operators.DedupOps.spanScrub(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(0L) === ((19L, 16L, "u1 u2 u3")))
    assert(got(1L) === ((20L, 16L, "v1 v2 v3 v4")))
    assert(got(2L) === ((2L, 0L, "tiny doc")))
    assert(got(3L) === ((20L, 20L, "")))
    assert(got(4L) === ((20L, 20L, "")))
  }

  /** The dispatch probe near the 250k bar: a planted hot key at the bar
    * ±20 % must produce a STABLE estimate (seeded sample — the chosen
    * plan may not flap run-to-run) that lands within ±20 % of truth, and
    * the dispatch comparison must flip exactly where it should well
    * clear of the bar.
    */
  test("estimatedHotKeyRows is run-to-run stable and within ±20% at the " +
    "dispatch bar; dispatch flips correctly clear of it") {
    val bar = EventOps.hotKeyTaskRows // 250000
    // hot key 0 at exactly the bar; 200k background rows over 1000 keys
    val hot = spark.range(bar).select(lit(0L).as("user_id"))
    val bg = spark.range(200000L)
      .select((col("id") % 1000L + 1L).as("user_id"))
    val keys = hot.unionByName(bg).repartition(8, col("user_id"))
      .cache()
    keys.count()
    val est1 = EventOps.estimatedHotKeyRows(keys)
    val est2 = EventOps.estimatedHotKeyRows(keys)
    val est3 = EventOps.estimatedHotKeyRows(keys)
    assert(est1 === est2 && est2 === est3,
      s"seeded probe not reproducible: $est1 / $est2 / $est3")
    assert(math.abs(est1 - bar).toDouble / bar <= 0.20,
      s"boundary estimate $est1 off truth $bar by >20%")
    // clear above the bar (2x): must dispatch segmented
    val hot2x = spark.range(2 * bar).select(lit(0L).as("user_id"))
      .unionByName(bg).repartition(8, col("user_id")).cache()
    hot2x.count()
    assert(EventOps.estimatedHotKeyRows(hot2x) > bar,
      "2x-bar hot key not detected as segmented-worthy")
    // uniform control (hottest key ~200 rows): must dispatch plain
    val uniform = spark.range(200000L)
      .select((col("id") % 1000L).as("user_id"))
      .repartition(8, col("user_id")).cache()
    uniform.count()
    assert(EventOps.estimatedHotKeyRows(uniform) < bar,
      "uniform keys misdetected as skewed")
    keys.unpersist(); hot2x.unpersist(); uniform.unpersist()
    ()
  }
}
