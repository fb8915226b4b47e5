package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality operators — the validation pass a training-data pipeline
  * runs before ingestion (and the engine-grade version of the reference's
  * manual golden-table audits, README.md:94–99: counting losses and
  * duplicates IS a data-quality check).
  *
  * Scale notes: `dq_profile` computes every column statistic in ONE scan
  * (a single aggregate row of many expressions — not one job per column);
  * `dq_constraints` is three aggregates over two scans, with the FK probe
  * as a broadcast-able anti join.
  */
object DataQualityOps extends OpModule {

  /** Single-pass profile of lineitem: volume, null counts, distincts,
    * ranges. The unpivoted output shape (one row per metric) keeps the
    * schema stable as metrics are added.
    */
  def profile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val one = li.agg(
      count(lit(1)).as("row_count"),
      countDistinct(col("l_orderkey")).as("distinct_orders"),
      countDistinct(col("l_partkey")).as("distinct_parts"),
      sum(when(col("l_quantity").isNull, 1L).otherwise(0L))
        .as("null_quantity"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L))
        .as("null_shipdate"),
      expr("CAST(min(l_quantity) AS DOUBLE)").as("min_quantity"),
      expr("CAST(max(l_quantity) AS DOUBLE)").as("max_quantity"))
    one.unpivot(
      Array.empty[org.apache.spark.sql.Column],
      one.columns.map(c => col(c).cast("double")),
      "metric", "value")
      .orderBy(col("metric"))
  }

  /** Constraint violations, one row per rule: key uniqueness, FK
    * coverage, domain bounds. All zeros on healthy data — the point is
    * that the ENGINE proves it, not the generator.
    */
  def constraints(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val orders = Tables.orders(s, dir)
    val dupKeys = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .agg(count(lit(1)).as("violations"))
      .withColumn("rule", lit("pk_unique_orderkey_linenumber"))
    val orphans = li.join(orders,
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .withColumn("rule", lit("fk_lineitem_orders"))
    val domain = li.filter(col("l_quantity") <= 0 ||
        col("l_discount") < 0 || col("l_discount") > 1)
      .agg(count(lit(1)).as("violations"))
      .withColumn("rule", lit("domain_quantity_discount"))
    dupKeys.unionByName(orphans).unionByName(domain)
      .select(col("rule"), col("violations"))
      .orderBy(col("rule"))
  }

  /** Distribution DRIFT between the prior snapshot and the new batch —
    * the monitoring gate a pipeline runs per crawl ("did the new data's
    * shape move?"): population-stability-index terms over fixed-edge
    * token-length buckets (width 10, capped at 9 — fixed edges, never
    * data-derived quantiles, so the bucketing is deterministic and
    * comparable across runs). PSI term = (p_batch − p_store) ·
    * ln(p_batch/p_store); |PSI| sums read as <0.1 stable / >0.25 shifted.
    *
    * Scale shape: two narrow filtered aggregations over the pushed-down
    * snapshot boundary, a full-outer join of two ≤10-row histograms, and
    * window totals over that METADATA frame (10 rows — not a data-volume
    * window). `ln` parity with DuckDB is the `llm_tfidf` precedent.
    */
  def drift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = Tables.snapshotBoundary(s, dir, "documents")
    val docs = Tables.documents(s, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("bucket", least(expr("n_tokens div 10"), lit(9)))
    def hist(side: DataFrame, asCol: String) =
      side.groupBy(col("bucket")).agg(count(lit(1)).as(asCol))
    val joined = hist(docs.filter(col("doc_id") < k), "n_store")
      .join(hist(docs.filter(col("doc_id") >= k), "n_batch"),
        Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_store"), lit(0L)).as("n_store"),
        coalesce(col("n_batch"), lit(0L)).as("n_batch"))
    val w = Window.partitionBy()
    joined
      .withColumn("p_store",
        col("n_store").cast("double") / sum(col("n_store")).over(w).cast("double"))
      .withColumn("p_batch",
        col("n_batch").cast("double") / sum(col("n_batch")).over(w).cast("double"))
      .withColumn("psi_term",
        when(col("n_store") > 0 && col("n_batch") > 0,
          (col("p_batch") - col("p_store")) *
            log(col("p_batch") / col("p_store"))))
      .select(col("bucket"), col("n_store"), col("n_batch"),
        col("p_store"), col("p_batch"), col("psi_term"))
      .orderBy(col("bucket"))
  }

  /** Fixed-width numeric histogram of `l_extendedprice` — the profiling
    * companion to [[profile]]'s scalar stats ("what does the distribution
    * LOOK like?"), and the batch form of [[drift]]'s bucketing: width 5000
    * from 0, top-coded at bucket 19, so edges are constants, never
    * data-derived quantiles — the histogram is comparable across runs and
    * engines by construction.
    *
    * Scale shape: one narrow bucket projection + one hash aggregate (≤20
    * groups, map-side partials carry almost everything), then the share
    * ratio over the ≤20-row METADATA frame — the unpartitioned window
    * never sees data volume (the dq_drift precedent).
    */
  def histogram(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, dir)
    val w = Window.partitionBy()
    li.groupBy(least(floor(col("l_extendedprice") / 5000.0d), lit(19L))
        .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .withColumn("share",
        col("n").cast("double") / sum(col("n")).over(w).cast("double"))
      .orderBy(col("bucket"))
  }

  /** Per-group 3σ outlier census over the event stream: each event type's
    * count, how many of its values sit more than three sample standard
    * deviations from its mean, and the most extreme |z| — the anomaly
    * gate a pipeline runs on metric columns before training on them.
    *
    * Parity design (the [[graft.operators.AggOps.statsMoments]]
    * precedent): mean/std come from DECIMAL-exact sums (order-independent
    * — a float sum would differ run-to-run under Spark's partition
    * nondeterminism, let alone vs DuckDB), cast to DOUBLE at the edge;
    * each row's z is then a fixed IEEE op sequence, identical on both
    * engines. Scale shape: one aggregate to a |types|-row moments frame,
    * broadcast back over the stream, one final aggregate — two scans, no
    * data-volume shuffle beyond the groupBys' partial aggregation.
    */
  def outliers(s: SparkSession, dir: String): DataFrame = {
    val sx = "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"
    val sx2 = """CAST(SUM(CAST(value AS DECIMAL(18,2)) *
      | CAST(value AS DECIMAL(18,2))) AS DOUBLE)"""
      .stripMargin.replaceAll("\n", "")
    val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
    val moments = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), expr(sx).as("sx"), expr(sx2).as("sx2"))
      .withColumn("mean", col("sx") / col("n"))
      // variance must be strictly positive before sqrt: a constant-valued
      // group can round sx2 - sx²/n one ulp NEGATIVE (Spark sqrt → NaN,
      // which ranks greatest and flags the whole group; DuckDB sqrt →
      // hard error), and a zero variance would divide z by 0 (±Inf on
      // Spark, NULL on DuckDB) — NULL std on both engines makes every z
      // NULL, counted as not-an-outlier, identically
      .withColumn("var",
        (col("sx2") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
      .withColumn("std",
        when(col("n") > 1 && col("var") > 0, sqrt(col("var"))))
      .select(col("event_type"), col("mean"), col("std"))
    ev.join(broadcast(moments), "event_type")
      .withColumn("z", (col("value") - col("mean")) / col("std"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("z")) > 3.0, 1L).otherwise(0L)).as("n_outliers"),
        max(abs(col("z"))).as("max_abs_z"))
      .orderBy(col("event_type"))
  }

  /** Referential-integrity reconciliation across the star schema: for
    * each foreign-key edge (lineitem→orders, orders→customer,
    * customer→nation) the orphan count, plus the reverse check (orders
    * with no lineitems — childless parents). The post-load audit a
    * warehouse runs before publishing a snapshot.
    *
    * Scale shape: each check is ONE left-outer hash join on the FK (the
    * parent key is unique, so no fanout) with the violation counted as a
    * null-probe sum — total and violations come out of a single pass.
    * The childless-parent check distincts the child keys first, so the
    * join moves one row per key, not per child row. The four 1-row
    * results union into a constant-size report.
    */
  def referential(s: SparkSession, dir: String): DataFrame = {
    def check(name: String, child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
      child.join(parent, col(childKey) === col(parentKey), "left_outer")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col(parentKey).isNull, 1L).otherwise(0L))
            .as("n_violations"))
        .select(lit(name).as("check_name"), col("n_total"),
          col("n_violations"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"))
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val nat = Tables.nation(s, dir)
    check("lineitem_to_orders", li, "l_orderkey",
        ord.select(col("o_orderkey")), "o_orderkey")
      .unionAll(check("orders_to_customer",
        ord.select(col("o_custkey")), "o_custkey",
        cust.select(col("c_custkey")), "c_custkey"))
      .unionAll(check("customer_to_nation",
        cust.select(col("c_nationkey")), "c_nationkey",
        nat.select(col("n_nationkey")), "n_nationkey"))
      .unionAll(check("orders_with_lineitems",
        ord.select(col("o_orderkey")), "o_orderkey",
        li.distinct().withColumnRenamed("l_orderkey", "lk"), "lk"))
      .orderBy(col("check_name"))
  }

  /** Ingest freshness monitoring: per event type, the last-seen
    * timestamp, its lag against the monitoring instant, and the
    * trailing-24h volume — the staleness dashboard a pipeline operator
    * watches to catch a dead collector (lag grows) or a stuck partition
    * (24h volume collapses while last_ts looks alive).
    *
    * The monitoring instant is CONFIG (in production: the scheduler's
    * logical "now"), pinned here to the first instant past the fixture's
    * 30-day window — the [[graft.Tables.snapshotBoundary]] stance: a
    * literal composes into one narrow aggregate pass, where a
    * data-derived `max(ts)` would cost a driver action or a global
    * window. One map-side-combined aggregate over the raw events; all
    * lag arithmetic is exact integer microseconds.
    */
  def freshness(s: SparkSession, dir: String): DataFrame = {
    val refUs = 1706659200L * 1000000L // 2024-01-31 00:00:00 UTC, config
    val dayUs = 86400L * 1000000L
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max(col("ts")).as("last_ts"),
        sum(when(unix_micros(col("ts")) > refUs - dayUs, 1L).otherwise(0L))
          .as("n_last_24h"))
      .withColumn("lag_s",
        expr(s"($refUs - unix_micros(last_ts)) div 1000000"))
      .withColumn("stale", col("lag_s") > 3600L)
      .select(col("event_type"), col("n_events"), col("last_ts"),
        col("lag_s"), col("n_last_24h"), col("stale"))
      .orderBy(col("event_type"))
  }

  /** Robust outlier census — the median/MAD twin of [[outliers]]' 3σ
    * gate: mean/stddev are themselves dragged by the outliers they hunt,
    * while the median absolute deviation stays put (breakdown point ½),
    * so heavy-tailed metric columns (exactly where anomaly gates matter)
    * get a stable threshold. Flag: |x − median| > 3 · 1.4826 · MAD (the
    * Gaussian-consistency constant).
    *
    * Parity design: median and MAD are `percentile` ≡ DuckDB
    * `quantile_cont` (the [[AggOps]] agg_percentile-proven equivalence);
    * the deviation and threshold are the same fixed IEEE op sequence on
    * both engines, so every per-row verdict lands identically.
    *
    * Scale shape: two sort-based aggregates to |types|-row frames (the
    * second pass needs the first's median — MAD is inherently two-pass),
    * each broadcast back over the stream; the final census is one
    * map-side-combined aggregate. Three scans of one column, no
    * data-volume shuffle, no window over the stream.
    */
  def anomalyMad(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = ev.join(broadcast(med), "event_type")
      .groupBy(col("event_type"), col("med"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    ev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("value") - col("med")) >
          lit(3.0) * lit(1.4826) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        max(abs(col("value") - col("med"))).as("max_abs_dev"))
      .select(col("event_type"), col("n"), col("med"), col("mad"),
        col("n_outliers"), col("max_abs_dev"))
      .orderBy(col("event_type"))
  }

  /** Benford first-significant-digit audit on the money column — the
    * classic fabricated-data / unit-mixup detector: natural multi-scale
    * amounts follow P(d) = log₁₀(1 + 1/d), so a digit census far off that
    * curve flags synthetic or corrupted feeds.
    *
    * Parity design: the digit comes from the STRING head of exact integer
    * cents (no float log10 — `round(x·100)` is never a .5 tie because the
    * source is 2-decimal money), the observed share is fixed-point
    * `n·10⁶ DIV total`, and the expected shares are integer micro
    * CONSTANTS quantized once from log₁₀(1+1/d) — both engines compare
    * integers end to end. The census is ≤ 9 rows, so the
    * empty-partition window computing `total` is a 9-row single task
    * (the dq_profile-sanctioned aggregated-frame pattern), never a
    * data-volume straggler.
    */
  def benford(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val expMicro = typedlit(Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L,
      9 -> 45757L))
    Tables.lineitem(s, dir)
      .select(substring(
        expr("CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS STRING)"),
        1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .withColumn("obs_micro", expr("n * 1000000 DIV total"))
      .withColumn("exp_micro", element_at(expMicro, col("digit")))
      .withColumn("dev_micro", abs(col("obs_micro") - col("exp_micro")))
      .select(col("digit"), col("n"), col("obs_micro"), col("exp_micro"),
        col("dev_micro"))
      .orderBy(col("digit"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_benford" -> benford,
    "dq_anomaly_mad" -> anomalyMad,
    "dq_freshness" -> freshness,
    "dq_profile" -> profile,
    "dq_constraints" -> constraints,
    "dq_drift" -> drift,
    "dq_histogram" -> histogram,
    "dq_outliers" -> outliers,
    "dq_referential" -> referential
  )

  val oracle: Map[String, String] = Map(
    "dq_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100)
        |         AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM lineitem),
        |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |t AS (SELECT c.*, CAST(sum(n) OVER () AS BIGINT) AS total FROM c),
        |e AS (
        |  SELECT t.*, n * 1000000 // total AS obs_micro,
        |         CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
        |              WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
        |              WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
        |              WHEN 9 THEN 45757 END AS BIGINT) AS exp_micro
        |  FROM t)
        |SELECT digit, n, obs_micro, exp_micro,
        |       abs(obs_micro - exp_micro) AS dev_micro
        |FROM e ORDER BY digit""".stripMargin,
    "dq_anomaly_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |mad AS (
        |  SELECT e.event_type, m.med,
        |         quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN med m ON e.event_type = m.event_type
        |  GROUP BY 1, 2)
        |SELECT e.event_type, count(*) AS n, d.med, d.mad,
        |       CAST(sum(CASE WHEN abs(e.value - d.med)
        |                          > 3.0 * 1.4826 * d.mad
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       max(abs(e.value - d.med)) AS max_abs_dev
        |FROM events e JOIN mad d ON e.event_type = d.event_type
        |GROUP BY 1, 3, 4 ORDER BY e.event_type""".stripMargin,
    "dq_freshness" ->
      """WITH e AS (
        |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT event_type, count(*) AS n_events, max(ts) AS last_ts,
        |       (1706659200000000 - epoch_us(max(ts))) // 1000000 AS lag_s,
        |       CAST(sum(CASE WHEN epoch_us(ts) >
        |                          1706659200000000 - 86400000000
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_last_24h,
        |       (1706659200000000 - epoch_us(max(ts))) // 1000000 > 3600
        |         AS stale
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "dq_referential" ->
      """SELECT * FROM (
        |  SELECT 'lineitem_to_orders' AS check_name,
        |         count(*) AS n_total,
        |         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_violations
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'orders_to_customer', count(*),
        |         CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT 'customer_to_nation', count(*),
        |         CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  UNION ALL
        |  SELECT 'orders_with_lineitems', count(*),
        |         CAST(sum(CASE WHEN lk.lk IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM orders o LEFT JOIN
        |    (SELECT DISTINCT l_orderkey AS lk FROM lineitem) lk
        |    ON o.o_orderkey = lk.lk)
        |ORDER BY check_name""".stripMargin,
    "dq_outliers" ->
      """WITH s AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2)) *
        |                  CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx2
        |  FROM events GROUP BY event_type),
        |v AS (
        |  SELECT event_type, n, sx / n AS mean,
        |         (sx2 - sx * sx / n) / (n - 1) AS var
        |  FROM s),
        |m AS (
        |  SELECT event_type, mean,
        |         CASE WHEN n > 1 AND var > 0 THEN sqrt(var) END AS std
        |  FROM v)
        |SELECT e.event_type, count(*) AS n,
        |       CAST(sum(CASE WHEN abs((value - mean) / std) > 3.0
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       max(abs((value - mean) / std)) AS max_abs_z
        |FROM events e JOIN m USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "dq_histogram" ->
      """WITH b AS (
        |  SELECT CAST(least(floor(l_extendedprice / 5000.0), 19) AS BIGINT)
        |           AS bucket,
        |         l_extendedprice
        |  FROM lineitem),
        |h AS (
        |  SELECT bucket, count(*) AS n,
        |         min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |  FROM b GROUP BY bucket)
        |SELECT bucket, n, lo, hi,
        |       CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS share
        |FROM h ORDER BY bucket""".stripMargin,
    "dq_drift" ->
      """WITH k AS (SELECT max(doc_id) * 4 // 5 AS kv FROM documents),
        |d AS (
        |  SELECT doc_id,
        |         least(len(string_split(text, ' ')) // 10, 9) AS bucket
        |  FROM documents),
        |hs AS (SELECT bucket, count(*) AS n_store
        |       FROM d, k WHERE doc_id < kv GROUP BY bucket),
        |hb AS (SELECT bucket, count(*) AS n_batch
        |       FROM d, k WHERE doc_id >= kv GROUP BY bucket),
        |j AS (
        |  SELECT COALESCE(hs.bucket, hb.bucket) AS bucket,
        |         COALESCE(n_store, 0) AS n_store,
        |         COALESCE(n_batch, 0) AS n_batch
        |  FROM hs FULL OUTER JOIN hb ON hs.bucket = hb.bucket),
        |t AS (
        |  SELECT bucket, n_store, n_batch,
        |         CAST(n_store AS DOUBLE) /
        |           CAST(SUM(n_store) OVER () AS DOUBLE) AS p_store,
        |         CAST(n_batch AS DOUBLE) /
        |           CAST(SUM(n_batch) OVER () AS DOUBLE) AS p_batch
        |  FROM j)
        |SELECT bucket, n_store, n_batch, p_store, p_batch,
        |       CASE WHEN n_store > 0 AND n_batch > 0
        |            THEN (p_batch - p_store) * ln(p_batch / p_store)
        |            ELSE NULL END AS psi_term
        |FROM t ORDER BY bucket""".stripMargin,
    "dq_profile" ->
      """WITH one AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS row_count,
        |         CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS distinct_orders,
        |         CAST(count(DISTINCT l_partkey) AS DOUBLE) AS distinct_parts,
        |         CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
        |              AS DOUBLE) AS null_quantity,
        |         CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |              AS DOUBLE) AS null_shipdate,
        |         CAST(min(l_quantity) AS DOUBLE) AS min_quantity,
        |         CAST(max(l_quantity) AS DOUBLE) AS max_quantity
        |  FROM lineitem)
        |SELECT metric, value FROM (
        |  SELECT 'row_count' AS metric, row_count AS value FROM one
        |  UNION ALL SELECT 'distinct_orders', distinct_orders FROM one
        |  UNION ALL SELECT 'distinct_parts', distinct_parts FROM one
        |  UNION ALL SELECT 'null_quantity', null_quantity FROM one
        |  UNION ALL SELECT 'null_shipdate', null_shipdate FROM one
        |  UNION ALL SELECT 'min_quantity', min_quantity FROM one
        |  UNION ALL SELECT 'max_quantity', max_quantity FROM one) t
        |ORDER BY metric""".stripMargin,
    "dq_constraints" ->
      """SELECT rule, violations FROM (
        |  SELECT 'pk_unique_orderkey_linenumber' AS rule,
        |         (SELECT count(*) FROM (
        |            SELECT 1 FROM lineitem
        |            GROUP BY l_orderkey, l_linenumber
        |            HAVING count(*) > 1)) AS violations
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders',
        |         (SELECT count(*) FROM lineitem
        |          WHERE NOT EXISTS (SELECT 1 FROM orders
        |                            WHERE o_orderkey = l_orderkey))
        |  UNION ALL
        |  SELECT 'domain_quantity_discount',
        |         (SELECT count(*) FROM lineitem
        |          WHERE l_quantity <= 0 OR l_discount < 0 OR l_discount > 1)
        |) t ORDER BY rule""".stripMargin
  )
}
