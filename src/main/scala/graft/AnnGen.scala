package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** DISTRIBUTED ANN fixture generator — embeddings only, at corpus sizes
  * where [[StressGen]]'s driver-side array (fine to ~4M vectors) stops
  * being reasonable. Generation is a deterministic per-id function
  * (seeded java.util.Random per row — no RNG state crosses rows), so it
  * is embarrassingly parallel and any row is reproducible in isolation:
  * exactly the pattern a 100 TB fixture build would use.
  *
  * Same planted structure as StressGen so every ANN bench reads either
  * fixture family identically: every 400th embedding is its predecessor
  * plus tiny gaussian noise (cosine ≈ 0.999 — the near-dup plant), the
  * rest iid 64-dim gaussians. NOT an oracle fixture; throughput/recall
  * measurement only.
  *
  * Usage: tools/run_main.sh AnnGen <outDir> <nVectors>
  */
object AnnGen {
  val dims = 64

  private[graft] def vecOf(i: Long): Array[Float] = {
    val r = new java.util.Random(i * 1000003L + 17L)
    Array.fill(dims)(r.nextGaussian().toFloat)
  }

  private[graft] def rowVec(id: Long): Array[Float] =
    if (id % 400 == 1 && id > 0) {
      val b = vecOf(id - 1)
      val nz = new java.util.Random(id * 7919L + 23L)
      b.map(x => x + (nz.nextGaussian() * 0.02).toFloat)
    } else vecOf(id)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AnnGen <outDir> <nVectors>")
    val out = args(0)
    val n = args(1).toLong
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    spark.range(n).repartition(64).as[Long]
      .map(id => (id, rowVec(id), (id % 10).toInt))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val meta = new java.util.Properties()
    meta.setProperty("embeddings.maxId", (n - 1).toString)
    val metaOut = new java.io.FileWriter(s"$out/${Tables.fixtureMetaFile}")
    try meta.store(metaOut, "graft fixture boundary constants (AnnGen)")
    finally metaOut.close()
    println(s"[anngen] wrote $n vectors to $out")
    spark.stop()
  }
}
