package graft

import graft.operators.IngestOps

class IngestOpsSpec extends SparkSpec {
  test("exactly_once_upsert returns one row per event_type, applied twice == once") {
    val df = IngestOps.exactlyOnceUpsert(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // one row per event_type, ordered
    val types = rows.map(_.getString(0))
    assert(types.sorted.sameElements(types))
    assert(types.distinct.length === types.length)
    // idempotence: event_ids are unique in the fixture, so dedup-last-wins
    // must keep exactly all 1000 events at sf0.001
    val total = rows.map(_.getLong(1)).sum
    assert(total === Tables.events(spark, sf0001).count())
  }
}
