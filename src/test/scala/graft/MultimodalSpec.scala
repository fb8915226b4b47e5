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

  // Deterministic REAL PNG bytes: a grey gradient whose luminance equals
  // the pixel value, so the expected histogram is computable by hand.
  private def pngBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 31 + y * 17 + seed) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodePng decodes real PNG bytes to the exact pixel histogram") {
    // a solid 16x16 grey-128 image: every pixel lands in luminance bin 8
    val solid = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      solid.setRGB(x, y, (128 << 16) | (128 << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(solid, "png", bos)
    val f = MultimodalOps.decodePng(bos.toByteArray)
    assert(f.length === 16)
    assert(f(8) === 1.0f)
    assert(f.sum === 1.0f)
    // gradient image: histogram matches a direct per-pixel count
    val g = pngBytes(20, 10, 7)
    val got = MultimodalOps.decodePng(g)
    val want = new Array[Float](16)
    for (y <- 0 until 10; x <- 0 until 20)
      want(((x * 31 + y * 17 + 7) % 256) >> 4) += 1f / 200f
    assert(got.length === 16)
    got.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
    // and it rejects non-image bytes loudly instead of emitting garbage
    intercept[IllegalArgumentException] {
      MultimodalOps.decodePng("not a png".getBytes("UTF-8"))
    }
  }

  // Real 16-bit mono PCM WAV bytes via the JDK's own writer.
  private def wavBytes(samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s2, i) =>
      raw(2 * i) = (s2 & 0xff).toByte
      raw(2 * i + 1) = ((s2 >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeWav decodes real PCM: energy lands in the loud half only") {
    // first half silence, second half full-scale square wave: all the RMS
    // mass must sit in segments 8..15, equally split
    val samples = new Array[Short](1600)
    (800 until 1600).foreach(i =>
      samples(i) = if (i % 2 == 0) 16384 else -16384)
    val f = MultimodalOps.decodeWav(wavBytes(samples))
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0f) < 1e-5)
    (0 until 8).foreach(i => assert(f(i) === 0.0f, s"segment $i not silent"))
    (8 until 16).foreach(i => assert(math.abs(f(i) - 0.125f) < 1e-5))
    // all-silence clip → zero vector, not NaN
    assert(MultimodalOps.decodeWav(wavBytes(new Array[Short](320)))
      .forall(_ === 0.0f))
  }

  test("mediaFeatures runs the REAL codec through the mapPartitions shape") {
    import spark.implicits._
    val tone = Array.tabulate[Short](800)(i =>
      (math.sin(i * 0.2) * 20000).toShort)
    val media = Seq(
      MultimodalOps.MediaRecord(1L, pngBytes(8, 8, 1), "image/png", 8, 8, 3),
      MultimodalOps.MediaRecord(2L, pngBytes(12, 6, 2), "image/png", 12, 6, 3),
      MultimodalOps.MediaRecord(3L, "plain bytes".getBytes("UTF-8"),
        "video/mp4", 0, 0, 3),
      MultimodalOps.MediaRecord(4L, wavBytes(tone), "audio/wav", 0, 0, 1)
    ).toDF()
    val got = MultimodalOps.mediaFeatures(spark, media).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[Float]]("features").toArray).toMap
    // distributed result == driver-side decode of the same bytes
    assert(got(1L).sameElements(MultimodalOps.decodePng(pngBytes(8, 8, 1))))
    assert(got(2L).sameElements(MultimodalOps.decodePng(pngBytes(12, 6, 2))))
    assert(got(4L).sameElements(MultimodalOps.decodeWav(wavBytes(tone))))
    // rows with no real codec fall back to the deterministic stub
    assert(got(3L).sameElements(
      MultimodalOps.decodeStub("plain bytes".getBytes("UTF-8"))))
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
