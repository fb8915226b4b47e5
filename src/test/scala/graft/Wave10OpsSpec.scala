package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Round-9 wave-10 additions. */
class Wave10OpsSpec extends SparkSpec {

  test("ts_changepoint_cusum: prefix closed form equals the direct " +
    "max(0, S+dev) recurrence, recomputed on the driver") {
    val rows = EventOps.changepointCusum(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, series) =>
      val ordered = series.sortBy(_.getTimestamp(1).getTime)
      val n = ordered.map(_.getLong(2))
      val t = n.length.toLong
      val total = n.sum
      val dev = n.map(_ * t - total)
      var hi = 0L
      var lo = 0L
      ordered.zip(dev).foreach { case (r, d) =>
        hi = math.max(0L, hi + d)
        lo = math.max(0L, lo - d)
        assert(r.getLong(3) === hi,
          s"cusum_hi mismatch at ${r.getTimestamp(1)}")
        assert(r.getLong(4) === lo,
          s"cusum_lo mismatch at ${r.getTimestamp(1)}")
      }
      // deviations are centered: a full-series CUSUM ends at P_T = 0, so
      // the final hi score equals -min prefix and lo equals +max prefix
      assert(dev.sum === 0L)
    }
  }
}
