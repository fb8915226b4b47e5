package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Document deduplication (builder prompt: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard) over `documents`.
  *
  * Exact dedup is a hash-groupBy. Near-dup is the classic MinHash→LSH
  * pipeline: 3-gram shingles → 60 minhash permutations → 10 bands × 6 rows
  * → band-bucket self-join for candidates → EXACT Jaccard on candidates →
  * threshold. On this corpus the duplicate pairs sit at J ≥ 0.95 and the
  * background below 0.52, so the banding (P[miss] = (1-J^6)^10 ≈ 2e-6 at
  * J=0.95) recovers the exact answer — which is what the DuckDB oracle
  * computes pairwise.
  *
  * Scale notes (the whole point of LSH): the only quadratic step is the
  * within-bucket pairing; bucket sizes are bounded because only near-equal
  * minhash bands collide. Everything else is linear scans + two shuffles
  * (band groupBy, candidate join). A pairwise Jaccard over 100 TB is
  * impossible; this plan isn't.
  */
object DedupOps extends OpModule {

  /** 3-gram shingle set (distinct) from the whitespace tokens. */
  private def shingleCol: Column = expr(
    """array_distinct(
      |  CASE WHEN size(toks) >= 3 THEN
      |    transform(sequence(0, size(toks) - 3),
      |              i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
      |  ELSE array() END)""".stripMargin)

  private def withShingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shingles", shingleCol)
      .select(col("doc_id"), col("shingles"))

  /** LSH banding over the 60-permutation minhash sketch (params fixed-seed
    * in graft.functions.GraftFunctions): 10 bands × 6 rows.
    */
  private val Bands = 10
  private val Rows = 6

  /** Exact dedup: group by normalized-text digest, keep the smallest
    * doc_id as the canonical copy.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("digest",
        md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))
      .orderBy(col("keeper_id"))

  /** Near-dup pairs (exact Jaccard ≥ 0.9 on 3-gram shingles), found via
    * MinHash+LSH candidates.
    *
    * Plan shape (the 100 TB architecture): the corpus-wide pass computes
    * ONLY the 60-long minhash sketch per doc — fused from the token array
    * by graft_minhash_tokens, no shingle strings materialized, no distinct
    * (min is duplicate-insensitive). Shingle SETS are then built just for
    * the candidate docs (a semi-join-reduced sliver of the corpus) to
    * compute exact Jaccard. The only quadratic step is within-band-bucket
    * pairing.
    */
  def dedupNear(s: SparkSession, dir: String): DataFrame =
    pairStats(s, dir)
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** LSH candidate pairs with their exact shingle-set statistics:
    * (doc_a, doc_b, inter, uni, size_a, size_b).
    */
  private def pairStats(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val banded = Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("mh", expr("graft_minhash_tokens(toks)"))
      .withColumn("band", explode(expr(
        s"""transform(sequence(0, ${Bands - 1}),
           |  b -> struct(b AS band_idx,
           |              concat_ws(',', transform(slice(mh, b * $Rows + 1, $Rows),
           |                                       x -> cast(x AS string)))
           |                AS band_key))""".stripMargin)))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_key"))
    val cands = banded.as("x")
      .join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // Exact shingle sets only for docs that appear in some candidate pair.
    val candIds = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id"))).distinct()
    val sets = withShingles(s, dir)
      .join(candIds, "doc_id")
    val setsA = sets.select(col("doc_id").as("doc_a"),
      col("shingles").as("sh_a"))
    val setsB = sets.select(col("doc_id").as("doc_b"),
      col("shingles").as("sh_b"))
    cands.join(setsA, "doc_a").join(setsB, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("size_a", size(col("sh_a")))
      .withColumn("size_b", size(col("sh_b")))
      .withColumn("uni", col("size_a") + col("size_b") - col("inter"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"),
        col("size_a"), col("size_b"))
  }

  /** Directional containment |A∩B|/|A| and |A∩B|/|B| for the near-dup
    * pairs (jaccard ≥ 0.9 precondition keeps the LSH candidate set exact
    * by construction — a containment-only threshold could admit pairs the
    * jaccard-tuned banding never proposes).
    */
  def containment(s: SparkSession, dir: String): DataFrame =
    pairStats(s, dir)
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= 0.9)
      .withColumn("contain_a",
        col("inter").cast("double") / col("size_a"))
      .withColumn("contain_b",
        col("inter").cast("double") / col("size_b"))
      .select(col("doc_a"), col("doc_b"), col("contain_a"),
        col("contain_b"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** 64-bit SimHash fingerprints (xxhash64 token hashes, per-bit majority
    * vote), via the native one-pass graft_simhash expression
    * (graft.functions.SimHash). Engine-specific hash → no SQL oracle;
    * unit-tested instead (near-dup pairs must be close in Hamming
    * distance).
    */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("simhash", expr("graft_simhash(toks)"))
      .select(col("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_dedup_exact" -> dedupExact,
    "llm_dedup_near" -> dedupNear,
    "llm_dedup_simhash" -> simhash,
    "llm_containment" -> containment
  )

  val oracle: Map[String, String] = Map(
    "llm_dedup_exact" ->
      """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(regexp_replace(lower(text), '\s+', ' ', 'g'))
        |ORDER BY keeper_id""".stripMargin,
    // Full pairwise n-gram Jaccard — the exact answer LSH must recover.
    "llm_dedup_near" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         unnest(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' ||
        |                toks[i+2] for i in range(1, greatest(len(toks)-1, 1))]))
        |           AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |       CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
        |FROM inter
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,
    "llm_containment" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         unnest(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' ||
        |                toks[i+2] for i in range(1, greatest(len(toks)-1, 1))]))
        |           AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |       CAST(i AS DOUBLE) / sa.n AS contain_a,
        |       CAST(i AS DOUBLE) / sb.n AS contain_b
        |FROM inter
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin
  )
}
