package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted joins (SURVEY.md scale notes; builder prompt
  * "salting for skew").
  *
  * When one join key carries a disproportionate share of rows, the task
  * holding that key becomes the straggler no matter how many executors
  * exist. AQE's skew-join handles sort-merge cases adaptively; saltedJoin
  * is the explicit form for when the build side can be replicated: the
  * probe side gets a random salt in [0, salts), the build side is
  * replicated `salts` times, and the join key becomes (key, salt) — the
  * hot key's rows spread over `salts` tasks.
  *
  * Correctness is exact (inner equi-join only): every probe row meets
  * exactly one replica of each matching build row.
  */
object SkewOps {

  /** Inner equi-join of `probe` (large, possibly skewed) with `build`
    * (replicable) on `probeKey == buildKey`, salted `salts` ways.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic salt: spread by hash of the whole probe row id space —
    // rand() would break retry/replay determinism
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col).toSeq: _*), lit(salts.toLong))
        .cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
      salted(probeKey) === replicated(buildKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Diagnostic: rows per key, heaviest first — what you run before
    * deciding to salt.
    */
  def keyHistogram(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
}
