package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar function surface (SURVEY.md §2b "Scalar functions"): string,
  * date/time, math, array (higher-order), and JSON functions — all built-in
  * `org.apache.spark.sql.functions` (codegen'd, no UDFs).
  *
  * The string queries reproduce the reference's commit-token shape
  * `topic/partition/offset` (reference images/wiretapAtMostOnce.png:
  * `message.commit.token: "my_sensors_data/0/3"`); the JSON query parses the
  * same kind of per-message attribute payload the envelope carries.
  *
  * Scale notes: all queries are narrow (no shuffle except the final output
  * sort) and stay inside whole-stage codegen; the array query uses
  * higher-order functions (`transform`/`aggregate`/`filter`) which run over
  * the array in-place, no explode → no row blowup.
  */
object ScalarFnOps extends OpModule {

  /** Commit-token build + string ops over it. */
  def fnString(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("token", concat_ws("/",
        col("event_type"), col("user_id"), col("event_id")))
      .select(
        col("event_id"),
        col("token"),
        upper(col("event_type")).as("type_upper"),
        substring(col("token"), 1, 8).as("token_prefix"),
        length(col("token")).as("token_len"),
        element_at(split(col("token"), "/"), 1).as("token_topic"),
        regexp_replace(col("event_type"), "[aeiou]", "*").as("type_masked"))
      .orderBy(col("event_id"))

  /** Date/time extraction, truncation, and interval arithmetic on event ts. */
  def fnDate(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"),
        hour(col("ts")).as("h"),
        date_trunc("day", col("ts")).as("day_start"),
        (col("ts") + expr("INTERVAL 3 DAYS")).as("ts_plus3d"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .as("days_since"))
      .orderBy(col("event_id"))

  /** Math functions over lineitem prices. sqrt/abs/floor/ceil are IEEE-exact;
    * ln/exp agree to ≤1 ulp across engines, far inside the comparator's
    * 9-decimal canonicalization.
    */
  def fnMath(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        sqrt(col("l_extendedprice")).as("price_sqrt"),
        log(col("l_extendedprice")).as("price_ln"),
        floor(col("l_quantity")).as("qty_floor"),
        ceil(col("l_quantity")).as("qty_ceil"),
        pow(col("l_tax"), 2).as("tax_sq"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Higher-order array functions over embeddings: size, positive count
    * (filter), L2 norm (transform + aggregate in DOUBLE, sequential — the
    * same left-to-right sum DuckDB's list_sum does).
    */
  def fnArray(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"),
        sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")))
          .as("l2_norm"))
      .orderBy(col("vec_id"))

  /** JSON attribute extraction from events.props (the envelope payload). */
  def fnJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"))
      .withColumn("k_bucket", col("k_int") % 10)
      .orderBy(col("event_id"))

  /** Conditional / null-handling functions: CASE banding, nullif+coalesce,
    * greatest/least, boolean projection.
    */
  def fnConditional(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("low").as("band"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status_or_open"),
        greatest(col("o_totalprice"), lit(200000.0)).as("floor_price"),
        least(col("o_totalprice"), lit(200000.0)).as("capped_price"),
        (col("o_orderstatus") === "F").as("is_final"))
      .orderBy(col("o_orderkey"))

  /** Advanced string functions: edit distance (fuzzy-dedup primitive),
    * padding, initcap, translate, reverse.
    */
  def fnStringAdvanced(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        levenshtein(col("event_type"), lit("click")).as("lev_click"),
        initcap(col("event_type")).as("type_title"),
        lpad(col("event_type"), 10, ".").as("padded"),
        translate(col("event_type"), "aeiou", "AEIOU").as("vowels_up"),
        reverse(col("event_type")).as("reversed"))
      .orderBy(col("event_id"))

  /** Array manipulation over the token array: sort+slice, distinct count,
    * position lookup, containment.
    */
  def fnArrayOps(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        // Serialized to a scalar string so the driver's pandas comparator can
        // hash it (raw array<string> columns are unhashable there).
        array_join(slice(array_sort(col("toks")), 1, 3), " ")
          .as("first3_sorted"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        array_position(col("toks"), "the").cast("long").as("pos_the"),
        array_contains(col("toks"), "spark").as("has_spark"))
      .orderBy(col("doc_id"))

  /** Map-type functions: parse the JSON props into a map, mint a second
    * map from delimited text (str_to_map), merge them (map_concat), then
    * key/value extraction. Maps serialize for the comparator as sorted
    * key and value strings (maps themselves are unordered, so a sorted
    * scalar projection is the only stable cross-engine form).
    *
    * The minted keys are excluded from `pm` before the concat (kv wins on
    * collision): under the default `spark.sql.mapKeyDedupPolicy=EXCEPTION`
    * a props map that ever grew a 'type'/'uid' key would otherwise throw
    * at runtime — and the oracle applies the same filter, so neither side
    * leans on the fixture staying collision-free.
    */
  def fnMap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    // Presentation sort runs FIRST, on the four raw columns: a trailing
    // orderBy's range-exchange SAMPLES its child, re-evaluating the whole
    // json/map pipeline a second time (measured 0.9 → 1.95 s at sf0.1 —
    // the r14 fn_map flag). Sorting the skinny scan costs one cheap
    // sampling pass; the expensive expressions then run ONCE in
    // order-preserving narrow projects above the Sort.
    Tables.events(s, dir)
      .select(col("event_id"), col("props"), col("event_type"),
        col("user_id"))
      .orderBy(col("event_id"))
      .withColumn("pm",
        from_json(col("props"), MapType(StringType, StringType)))
      .withColumn("kv", str_to_map(
        concat(lit("type:"), col("event_type"), lit(",uid:"),
          col("user_id")),
        lit(","), lit(":")))
      .withColumn("m", map_concat(
        map_filter(col("pm"), (k, _) => !k.isin("type", "uid")), col("kv")))
      // ONE sorted entries array (struct ordering = key-major; keys are
      // unique so it is exactly key order) feeds both projections below.
      // The previous form ran `element_at(col("m"), k)` inside a
      // transform lambda over the sorted keys — and CollapseProject
      // inlines a computed column into a higher-order-function lambda,
      // re-evaluating the whole map_concat(map_filter(from_json(...)))
      // chain PER KEY (the r14 span-scrub lesson, PERF.md; measured 3×
      // the family median here). Entries-based extraction touches the
      // computed map once per row however the optimizer collapses it.
      .withColumn("se", array_sort(map_entries(col("m"))))
      .select(
        col("event_id"),
        size(col("m")).as("n_entries"),
        array_join(transform(col("se"), e => e.getField("key")), ",")
          .as("keys_sorted"),
        array_join(transform(col("se"), e => e.getField("value")), ",")
          .as("vals_by_key"),
        element_at(col("kv"), lit("uid")).cast("int").as("uid_val"),
        element_at(col("pm"), lit("k")).cast("int").as("k_val"))
  }

  /** Bitwise scalar surface over the event keys: and/or/xor/not, shifts,
    * population count — the ops id-hashing, bitmap flags, and bucket
    * assignment lean on. Fully narrow and codegen'd; 64-bit semantics
    * match DuckDB's integer operators exactly (two's complement, no
    * overflow at these id ranges).
    */
  def fnBitwise(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"))
      .withColumn("bxor", col("event_id").bitwiseXOR(col("user_id")))
      .withColumn("band", col("event_id").bitwiseAND(col("user_id")))
      .withColumn("bor", col("event_id").bitwiseOR(col("user_id")))
      .withColumn("bnot", expr("~event_id"))
      .withColumn("shl3", shiftleft(col("event_id"), 3))
      .withColumn("shr2", shiftright(col("event_id"), 2))
      .withColumn("popcnt", bit_count(col("event_id")))
      .orderBy(col("event_id"))

  /** URL parsing (`parse_url` — the scalar every crawl-processing
    * pipeline leans on for host/path/query splitting). The URL itself is
    * assembled deterministically from event columns so both engines see
    * identical well-formed inputs; Spark extracts with the real
    * `parse_url` (java.net.URI under the hood), the oracle re-derives
    * each part with anchored regexes — two independent parsers agreeing
    * value-for-value. Fully narrow and codegen'd; no shuffle but the
    * ordered output.
    */
  def fnUrl(s: SparkSession, dir: String): DataFrame =
    // sort-first (the fn_map lesson): a trailing orderBy's range sampling
    // would run the four parse_url calls twice; sorting the skinny scan
    // first keeps them to one order-preserving pass above the Sort
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("user_id"))
      .orderBy(col("event_id"))
      .select(col("event_id"),
        concat(lit("https://"), col("event_type"), lit(".example.com/u/"),
          col("user_id"), lit("/p?ref="), col("event_id") % 7,
          lit("&v=2")).as("url"))
      .withColumn("host", expr("parse_url(url, 'HOST')"))
      .withColumn("path", expr("parse_url(url, 'PATH')"))
      .withColumn("query", expr("parse_url(url, 'QUERY')"))
      .withColumn("ref", expr("parse_url(url, 'QUERY', 'ref')"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_url" -> fnUrl,
    "fn_bitwise" -> fnBitwise,
    "fn_map" -> fnMap,
    "fn_string" -> fnString,
    "fn_date" -> fnDate,
    "fn_math" -> fnMath,
    "fn_array" -> fnArray,
    "fn_json" -> fnJson,
    "fn_conditional" -> fnConditional,
    "fn_string_advanced" -> fnStringAdvanced,
    "fn_array_ops" -> fnArrayOps
  )

  val oracle: Map[String, String] = Map(
    "fn_url" ->
      """WITH u AS (
        |  SELECT event_id,
        |         'https://' || event_type || '.example.com/u/' ||
        |         CAST(user_id AS VARCHAR) || '/p?ref=' ||
        |         CAST(event_id % 7 AS VARCHAR) || '&v=2' AS url
        |  FROM events)
        |SELECT event_id, url,
        |       regexp_extract(url, '^https://([^/]+)/', 1) AS host,
        |       regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
        |       regexp_extract(url, '\?(.*)$', 1) AS query,
        |       regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref
        |FROM u ORDER BY event_id""".stripMargin,
    "fn_bitwise" ->
      """SELECT event_id, user_id,
        |       xor(event_id, user_id) AS bxor,
        |       event_id & user_id AS band,
        |       event_id | user_id AS bor,
        |       ~event_id AS bnot,
        |       event_id << 3 AS shl3,
        |       event_id >> 2 AS shr2,
        |       CAST(bit_count(event_id) AS INT) AS popcnt
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_map" ->
      """WITH f AS (
        |  SELECT *, list_filter(json_keys(props),
        |              k -> k NOT IN ('type', 'uid')) AS pk
        |  FROM events)
        |SELECT event_id,
        |       CAST(len(pk) + 2 AS INT) AS n_entries,
        |       array_to_string(list_sort(pk ||
        |         ['type', 'uid']), ',') AS keys_sorted,
        |       array_to_string(list_transform(
        |         list_sort(pk || ['type', 'uid']),
        |         k -> CASE WHEN k = 'type' THEN event_type
        |                   WHEN k = 'uid' THEN CAST(user_id AS VARCHAR)
        |                   ELSE json_extract_string(props, '$.' || k) END),
        |         ',') AS vals_by_key,
        |       CAST(user_id AS INT) AS uid_val,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k_val
        |FROM f ORDER BY event_id""".stripMargin,
    "fn_string" ->
      """WITH t AS (
        |  SELECT event_id,
        |         event_type || '/' || user_id || '/' || event_id AS token,
        |         event_type FROM events)
        |SELECT event_id, token,
        |       upper(event_type) AS type_upper,
        |       substring(token, 1, 8) AS token_prefix,
        |       length(token) AS token_len,
        |       string_split(token, '/')[1] AS token_topic,
        |       regexp_replace(event_type, '[aeiou]', '*', 'g') AS type_masked
        |FROM t ORDER BY event_id""".stripMargin,
    "fn_date" ->
      """SELECT event_id,
        |       CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
        |       CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
        |       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
        |       CAST(ts AS TIMESTAMP) + INTERVAL 3 DAY AS ts_plus3d,
        |       CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |            AS INT) AS days_since
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_discount - 0.05) AS disc_dev,
        |       sqrt(l_extendedprice) AS price_sqrt,
        |       ln(l_extendedprice) AS price_ln,
        |       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |       pow(l_tax, 2) AS tax_sq
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_array" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS INT) AS dim,
        |       CAST(embedding[1] AS DOUBLE) AS first_val,
        |       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |       sqrt(list_sum(list_transform(embedding,
        |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |       CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_array_ops" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents)
        |SELECT doc_id,
        |       array_to_string(list_sort(toks)[1:3], ' ') AS first3_sorted,
        |       CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        |       CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT)
        |         AS pos_the,
        |       list_contains(toks, 'spark') AS has_spark
        |FROM t ORDER BY doc_id""".stripMargin,
    "fn_string_advanced" ->
      """SELECT event_id,
        |       CAST(levenshtein(event_type, 'click') AS INT) AS lev_click,
        |       upper(substring(event_type, 1, 1)) ||
        |         substring(event_type, 2) AS type_title,
        |       lpad(event_type, 10, '.') AS padded,
        |       translate(event_type, 'aeiou', 'AEIOU') AS vowels_up,
        |       reverse(event_type) AS reversed
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_conditional" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 300000 THEN 'high'
        |            WHEN o_totalprice > 150000 THEN 'mid'
        |            ELSE 'low' END AS band,
        |       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        |       greatest(o_totalprice, 200000.0) AS floor_price,
        |       least(o_totalprice, 200000.0) AS capped_price,
        |       (o_orderstatus = 'F') AS is_final
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
