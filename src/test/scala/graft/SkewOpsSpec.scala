package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewOps

class SkewOpsSpec extends SparkSpec {

  test("salted join == plain join on skewed data (90% one key)") {
    import spark.implicits._
    // 9000 rows on key 1, 1000 spread across 2..101
    val probe = spark.range(10000)
      .withColumn("k", when(col("id") % 10 =!= 0, 1L)
        .otherwise(pmod(col("id"), lit(100L)) + 2))
      .withColumn("payload", col("id") * 7)
    val build = (1L to 101L).map(k => (k, s"dim_$k")).toDF("bk", "name")
    val plain = probe.join(build, col("k") === col("bk"))
      .select("id", "k", "name")
    val salted = SkewOps.saltedJoin(probe, build, "k", "bk", salts = 8)
      .select("id", "k", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("keyHistogram surfaces the hot key first") {
    import spark.implicits._
    val probe = spark.range(1000)
      .withColumn("k", when(col("id") % 10 =!= 0, 42L).otherwise(col("id")))
    val top = SkewOps.keyHistogram(probe, col("k")).first()
    assert(top.getAs[Long]("key") === 42L)
    assert(top.getAs[Long]("n") === 900L)
  }
}
