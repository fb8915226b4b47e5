package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.sources.SensorGenerator
import graft.streaming.DeliverySemantics._

/** Property generalization of the reference's fault-injection experiments
  * (SURVEY.md §5): for ARBITRARY crash points and overlaps, not just the
  * three hand-run goldens.
  */
object DeliveryProps extends Properties("delivery") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private def counters(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("counter").collect().map(_.getLong(0)).toSeq.sorted

  // (i) upsert idempotence: applying any batch twice ≡ once
  property("upsert(upsert(t,b),b) == upsert(t,b)") =
    forAll(Gen.choose(1L, 30L), Gen.choose(0L, 10L)) { (n, off) =>
      val t = SensorGenerator.batch(spark, 10, 0)
      val b = SensorGenerator.batch(spark, n, off)
      val once = upsert(t, b, "counter", "counter")
      val twice = upsert(once, b, "counter", "counter")
      counters(once) == counters(twice)
    }

  // (ii) replay equivalence: prefix ⧺ overlapping-suffix under dedup ≡ whole
  property("process(prefix)+process(overlap-suffix) == process(whole)") =
    forAll(Gen.choose(5L, 40L), Gen.choose(1L, 5L)) { (total, overlap) =>
      val crash = total / 2
      val replayFrom = math.max(0L, crash - overlap)
      val prefix = SensorGenerator.batch(spark, crash, 0)
      val suffix = SensorGenerator.batch(spark, total - replayFrom, replayFrom)
      val merged = exactlyOnce(prefix, suffix, "counter", "counter")
      counters(merged) == (0L until total)
    }

  // (iii) gap audit flags exactly the dropped counters
  property("auditGaps counts the lost window exactly") =
    forAll(Gen.choose(1L, 10L), Gen.choose(1L, 10L), Gen.choose(1L, 10L)) {
      (a, gap, b) =>
        val landed = SensorGenerator.batch(spark, a, 0)
          .unionByName(SensorGenerator.batch(spark, b, a + gap))
        val r = auditGaps(landed, "counter").collect().head
        r.getAs[Long]("lost") == gap && r.getAs[Long]("duplicated") == 0L
    }
}
