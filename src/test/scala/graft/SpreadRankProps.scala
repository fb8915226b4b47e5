package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.WindowOps

/** Property generalization of SpreadRankSpec: for ARBITRARY multisets
  * (random key skew, random tie density, random partition counts — the
  * boundary placements the hand-written cases can't enumerate), the
  * two-pass spread rank must agree with Spark's own window built-ins.
  */
object SpreadRankProps extends Properties("spreadRank") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private val rowsGen = for {
    n <- Gen.choose(1, 120)
    nKeys <- Gen.choose(1, 4)
    nVals <- Gen.choose(1, 6) // few distinct values → dense ties
    vals <- Gen.listOfN(n, Gen.choose(0, nVals - 1))
    keys <- Gen.listOfN(n, Gen.choose(0, nKeys - 1))
  } yield keys.zip(vals).zipWithIndex.map { case ((k, v), i) =>
    (s"k$k", v.toLong, i.toLong)
  }

  // rank/dense_rank from the weighted key-frame machinery == window forms
  property("grouped spreadRank == rank/dense_rank windows") =
    forAll(rowsGen, Gen.choose(1, 9)) { (rows, parts) =>
      import spark.implicits._
      val df = rows.toDF("k", "v", "id")
      val grouped = df.groupBy(col("k"), col("v"))
        .agg(count(lit(1)).as("__c"))
      val ranked = WindowOps.spreadRank(grouped, "k",
          Seq(col("v").desc), parts, weight = Some("__c"))
        .withColumn("r", col("__pre") - col("__c") + 1)
        .withColumn("d", col("__rn"))
      val got = df.join(ranked, Seq("k", "v"))
        .select(col("id"), col("r"), col("d")).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
      val w = Window.partitionBy(col("k")).orderBy(col("v").desc)
      val want = df.select(col("id"),
          rank().over(w).cast("long").as("r"),
          dense_rank().over(w).cast("long").as("d")).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
      got.toSeq == want.toSeq
    }

  // row numbers + totals over a unique order == row_number/count windows
  property("row-level spreadRank == row_number window + partition count") =
    forAll(rowsGen, Gen.choose(1, 9)) { (rows, parts) =>
      import spark.implicits._
      val df = rows.toDF("k", "v", "id")
      val got = WindowOps.spreadRank(df, "k",
          Seq(col("v"), col("id")), parts)
        .select(col("id"), col("__rn"), col("__n")).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
      val w = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
      val wAll = Window.partitionBy(col("k"))
      val want = df.select(col("id"),
          row_number().over(w).cast("long").as("rn"),
          count(lit(1)).over(wAll).as("n")).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
      got.toSeq == want.toSeq
    }
}
