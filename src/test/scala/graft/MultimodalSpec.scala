package graft

import graft.operators.MultimodalOps

class MultimodalSpec extends SparkSpec {

  test("decode stub is deterministic, fixed-dim, L1-normalized") {
    val bytes = "spark graft media payload".getBytes("UTF-8")
    val f1 = MultimodalOps.decodeStub(bytes)
    val f2 = MultimodalOps.decodeStub(bytes)
    assert(f1.sameElements(f2))
    assert(f1.length === 16)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
    assert(MultimodalOps.decodeStub(Array.emptyByteArray).length === 16)
  }

  test("mm_features covers every doc with n_bytes == text length") {
    val feats = MultimodalOps.mmFeatures(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "octet_length(text) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(feats.length === docs.size)
    feats.foreach { r =>
      assert(r.getAs[Int]("n_bytes") === docs(r.getAs[Long]("doc_id")))
    }
  }

  test("mm_frame_sample yields only video rows with frames <= 256 bytes") {
    val rows = MultimodalOps.mmFrameSample(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 3 === 2) // video/mp4 ids
      val fb = r.getAs[Int]("frame_bytes")
      assert(fb >= 0 && fb <= 256)
    }
  }
}
