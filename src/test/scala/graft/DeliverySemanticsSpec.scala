package graft

import org.apache.spark.sql.DataFrame
import graft.sources.SensorGenerator
import graft.streaming.DeliverySemantics._

/** The reference's three golden fault-injection tables (README.md:94–97,
  * 121–124, 159–162) as assertions, generalized by property checks in
  * DeliveryProps.
  */
class DeliverySemanticsSpec extends SparkSpec {

  private def gen(from: Long, until: Long): DataFrame =
    SensorGenerator.batch(spark, until - from, from)

  private def audit(df: DataFrame): (Long, Long, Long) = {
    val r = auditGaps(df, "counter").collect().head
    (r.getAs[Long]("n"), r.getAs[Long]("lost"), r.getAs[Long]("duplicated"))
  }

  test("at-most-once: crash loses the in-flight batch (counters 5-7 lost)") {
    val landed = atMostOnce(Seq(gen(0, 5), gen(5, 8), gen(8, 12)),
      lostBatch = 1)
    val (n, lost, dup) = audit(landed)
    assert(n === 9 && lost === 3 && dup === 0)
  }

  test("at-least-once: replayed overlap is duplicated (counter 5 twice)") {
    val landed = atLeastOnce(gen(0, 6), gen(5, 10))
    val (n, lost, dup) = audit(landed)
    assert(n === 11 && lost === 0 && dup === 1)
  }

  test("exactly-once: replay + idempotent upsert is clean (0-9 once each)") {
    val landed = exactlyOnce(gen(0, 6), gen(5, 10), "counter", "counter")
    val (n, lost, dup) = audit(landed)
    assert(n === 10 && lost === 0 && dup === 0)
  }

  test("upsert is last-wins on the ordering column") {
    import spark.implicits._
    val target = Seq((1L, 10L, "old"), (2L, 10L, "keep")).toDF("k", "v", "tag")
    val batch = Seq((1L, 20L, "new")).toDF("k", "v", "tag")
    val out = upsert(target, batch, "k", "v").orderBy("k").collect()
    assert(out.map(_.getString(2)).toSeq === Seq("new", "keep"))
  }

  // Regression for the payload tiebreak: rows sharing (key, ord) with
  // DIFFERENT payloads must pick one deterministic winner no matter how
  // the inputs are partitioned or which side they arrive on.
  test("same (key, ord), different payloads: deterministic winner") {
    import spark.implicits._
    val target = Seq((1L, 5L, "a", 10)).toDF("k", "v", "tag", "x")
    val batch = Seq((1L, 5L, "b", 3)).toDF("k", "v", "tag", "x")
    // name-sorted desc tiebreak: tag desc first → "b" wins
    val winners = Seq(
      upsert(target, batch, "k", "v"),
      upsert(batch, target, "k", "v"),
      upsert(target.repartition(7), batch.repartition(3), "k", "v"),
      upsert(target.repartition(1), batch.repartition(5), "k", "v")
    ).map(_.collect() match {
      case Array(r) => (r.getAs[String]("tag"), r.getAs[Int]("x"))
    })
    assert(winners.distinct === List(("b", 3)),
      s"winner must be stable across partitionings/sides: $winners")
  }

  // Regression for the orderable-tiebreak filter: map payload columns are
  // not orderable — upsert must skip them instead of throwing.
  test("upsert accepts non-orderable (map) payload columns") {
    import spark.implicits._
    val target = Seq((1L, 1L, Map("a" -> 1), "t1")).toDF("k", "v", "m", "tag")
    val batch = Seq((1L, 2L, Map("b" -> 2), "t2")).toDF("k", "v", "m", "tag")
    val out = upsert(target, batch, "k", "v").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Map[String, Int]]("m") === Map("b" -> 2))
  }
}
