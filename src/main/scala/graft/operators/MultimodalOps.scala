package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (builder prompt): image/audio/video as opaque
  * `binary` columns with typed metadata, decode/feature-extract as
  * batch-shaped partition-local transforms.
  *
  * The harness ships no media files, so the fixture payload is synthesized
  * (UTF-8 bytes of `documents.text` standing in for an encoded image) and
  * the fixture-facing decode is a STUB — [[MultimodalOps.decodeStub]] is a
  * deterministic fake that consumes bytes and emits a fixed-dim feature
  * vector. The REAL decode path exists too: [[MultimodalOps.decodePng]]
  * decodes actual PNG bytes through `javax.imageio` (JDK built-in — no
  * external codec), and [[MultimodalOps.mediaFeatures]] dispatches per
  * `media_type` inside the same mapPartitions shape; unit tests feed it
  * genuine generated PNGs. Everything around the decoders — binary schema,
  * metadata struct, typed Dataset + mapPartitions batch shape, partition
  * sizing — is the production plumbing and is what the tests exercise.
  *
  * Scale notes: media rows are wide (payload) and narrow in count, so the
  * feature pass uses mapPartitions (one decoder init per partition, not per
  * row — the expensive part of real decoders), stays shuffle-free, and
  * projects the payload away as early as possible.
  */
object MultimodalOps extends OpModule {

  /** A media row: opaque payload + typed metadata (the schema a real
    * image/audio table would carry).
    */
  case class MediaRecord(doc_id: Long, media: Array[Byte],
      media_type: String, width: Int, height: Int, channels: Int)

  case class MediaFeatures(doc_id: Long, n_bytes: Int,
      features: Array[Float])

  /** Synthesize the media table from documents: payload = UTF-8 bytes,
    * metadata derived deterministically.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("media_type"),
      (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
      (pmod(col("doc_id"), lit(3)) * 120 + 240).cast("int").as("height"),
      lit(3).as("channels"))

  /** STUB — stands in for the real decoder (e.g. JPEG → pixels → model
    * features). Deterministic: 16-bin byte histogram, L1-normalized.
    * Replace with a codec call; the signature (bytes in, fixed-dim floats
    * out) is the contract the pipeline depends on.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 4) += 1f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    hist.map(_ / n)
  }

  /** REAL image decoder for `image/png` payloads — `javax.imageio` ships
    * in the JDK, so no external codec is needed. Decode to pixels, emit a
    * 16-bin LUMINANCE histogram, L1-normalized: the same contract as
    * [[decodeStub]] (bytes in, fixed-dim floats out), but over actual
    * pixel data. [[decodeStub]] remains the oracle path for the
    * synthesized fixture, whose payloads are text bytes, not PNGs.
    */
  def decodePng(bytes: Array[Byte]): Array[Float] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val hist = new Array[Float](16)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        hist(lum >> 4) += 1f
        x += 1
      }
      y += 1
    }
    val n = math.max(img.getWidth * img.getHeight, 1).toFloat
    hist.map(_ / n)
  }

  /** REAL audio decoder for `audio/wav` payloads — `javax.sound.sampled`
    * ships in the JDK. Decode PCM frames, emit a 16-dim feature = RMS
    * energy of 16 equal time segments, L1-normalized: the same fixed-dim
    * contract as [[decodePng]]/[[decodeStub]], over actual samples.
    * Handles 16-bit signed little-endian mono (the canonical WAV PCM).
    */
  def decodeWav(bytes: Array[Byte]): Array[Float] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
        fmt.getChannels == 1 &&
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        s"expected 16-bit little-endian signed mono PCM, got $fmt — " +
          "stereo would silently interleave channels into the RMS bins")
      val raw = in.readAllBytes()
      val n = raw.length / 2
      val energy = new Array[Double](16)
      var i = 0
      while (i < n) {
        val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort
        val x = s.toDouble / 32768.0
        energy(math.min(i * 16 / math.max(n, 1), 15)) += x * x
        i += 1
      }
      val rms = energy.map(math.sqrt)
      val total = rms.sum
      if (total == 0.0) new Array[Float](16)
      else rms.map(e => (e / total).toFloat)
    } finally in.close()
  }

  /** [[mmFeatures]]'s plumbing with the REAL codecs in the loop: the same
    * typed Dataset + mapPartitions batch shape over any media frame,
    * decoder dispatched on `media_type` — `image/png` rows go through
    * [[decodePng]] (actual pixels), `audio/wav` through [[decodeWav]]
    * (actual PCM samples), everything else through the deterministic
    * stub. The partition-local structure is where a real pipeline opens
    * its codec/model session once per partition.
    */
  def mediaFeatures(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // real pipeline: val codec = Codec.open(); val model = Session.load()
      it.map { r =>
        val feats = r.media_type match {
          case "image/png" => decodePng(r.media)
          case "audio/wav" => decodeWav(r.media)
          case _ => decodeStub(r.media)
        }
        MediaFeatures(r.doc_id, r.media.length, feats)
      }
    }.toDF()
  }

  /** Metadata/bookkeeping pass over the media table — pure column ops,
    * oracle-checked (payload handled as opaque bytes end-to-end).
    */
  def mmMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(
        col("doc_id"), col("media_type"), col("width"), col("height"),
        octet_length(col("media")).as("n_bytes"),
        (col("width") * col("height") * col("channels")).as("n_pixels_decoded"))
      .orderBy(col("doc_id"))

  /** Feature extraction: typed Dataset + mapPartitions (batch shape: the
    * stub decoder is "initialized" once per partition, like a real codec /
    * model session would be).
    */
  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = mediaTable(s, dir).as[MediaRecord]
    ds.mapPartitions { it =>
      // real pipeline: val codec = Codec.open(); val model = Session.load()
      it.map { r =>
        MediaFeatures(r.doc_id, r.media.length, decodeStub(r.media))
      }
    }.toDF()
      // f0/f1 are the stub's FLOAT ratios cast to double unrounded: the
      // oracle reproduces the same float32 division, so both sides carry
      // bit-identical values into the comparator
      .select(col("doc_id"), col("n_bytes"),
        element_at(col("features"), 1).cast("double").as("f0"),
        element_at(col("features"), 2).cast("double").as("f1"))
      .orderBy(col("doc_id"))
  }

  /** "Video" frame sampling: cut the payload into 256-byte frames, keep
    * every 4th — the explode/row-shape plumbing of a real frame sampler.
    */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .filter(col("media_type") === "video/mp4")
      .withColumn("frame_idx", explode(sequence(lit(0),
        floor(octet_length(col("media")) / 256).cast("int"), lit(4))))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(substring(col("media"), col("frame_idx") * 256 + 1,
          lit(256))).as("frame_bytes"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Perceptual-hash image dedup — the multimodal twin of the text
    * simhash family ([[graft.functions]]' simhash library expression;
    * query surface `llm_simhash_portable`): decode each payload to its 16-dim feature
    * vector (the partition-local [[decodeStub]]/codec path, same
    * mapPartitions batch shape as [[mmFeatures]]), derive a 16-bit
    * perceptual hash (bit i = bin i above the 1/16 uniform-occupancy
    * line — a pHash-style above-average threshold over the histogram),
    * and census the hash buckets: images sharing a phash are
    * near-identical at this feature granularity, and `keeper_doc` is
    * the canonical representative.
    *
    * The threshold compares the stub's FLOAT32 ratio against the exact
    * 2⁻⁴ constant in float32 — the same bit-reproducible arithmetic
    * [[mmFeatures]]'s oracle proves out, so the whole verdict set
    * value-oracles despite passing through a binary payload. The bucket
    * key is (phash, width, height) — production pHash dedup conditions
    * on geometry, because a hash collision across different dimensions
    * is not the same image; on this SAME-DISTRIBUTION text fixture the
    * histogram hash alone would collapse to one bucket (everything is a
    * statistical near-dup of everything, which the unit test shows is a
    * fixture property, not an operator one — distinct payload
    * distributions separate cleanly).
    *
    * Scale shape: decode is narrow mapPartitions (one codec init per
    * partition), the hash is 16 compares in the same pass, and the only
    * shuffle is the map-side-combinable bucket count. Hamming-NEAR
    * buckets (phash within k bits) would ride the [[SimOps.annSrp]]
    * banding on these same bits; exact-bucket is the verdict form.
    */
  def mmDedupPhash(s: SparkSession, dir: String): DataFrame =
    phashed(s, dir)
      .groupBy(col("phash"), col("width"), col("height"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_doc"))
      .orderBy(col("phash"), col("width"), col("height"))

  /** The decoded (doc_id, phash, width, height) frame [[mmDedupPhash]]
    * censuses and [[mmPhashHamming]] indexes — one definition of the
    * decode + hash pass (per-partition codec init, [[phashOf]] bits).
    */
  private def phashed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRecord].mapPartitions { it =>
      // real pipeline: val codec = Codec.open() — once per partition
      it.map { r =>
        (r.doc_id, phashOf(decodeStub(r.media)), r.width, r.height)
      }
    }.toDF("doc_id", "phash", "width", "height")
  }

  /** Hamming-radius perceptual-hash search via MULTI-INDEX HASHING
    * (Norouzi et al., "Fast Search in Hamming Space with Multi-Index
    * Hashing", CVPR 2012): the 16-bit phash splits into 4 bands of 4
    * bits, and by pigeonhole any pair within Hamming distance ≤ 3 agrees
    * EXACTLY on at least one band — so candidates come from 4 band-bucket
    * equi-joins (conditioned on geometry, [[mmDedupPhash]]'s stance) and
    * the exact `bit_count(xor)` test verifies them. This is the
    * NEAR-match extension exact-bucket dedup cannot answer, in its
    * serving shape: a small probe set (every 25th doc — in production,
    * the new crawl batch) against the banded index, the same
    * query-vs-store asymmetry as [[SimOps]]' `annSrpFromStore`.
    *
    * Scale shape: the index side is 4 narrow rows per corpus doc; each
    * probe meets only its band-bucket mates (candidate volume ADAPTS to
    * similarity — the [[SimOps]] SRP stance; this same-distribution text
    * fixture is the documented worst case, where a geometry bucket is
    * near-uniform in phash), duplicates across bands collapse in one
    * distinct keyed on (probe, nbr), and the winner is picked by an
    * ENCODED integer min (`ham · 2³² + nbr_id` under a bounded-heap-less
    * single min aggregate) — no window over candidates, no pair ever
    * leaves its bucket's partition unaggregated.
    */
  def mmPhashHamming(s: SparkSession, dir: String): DataFrame = {
    // pinned (4 narrow columns per doc): the census, the second-min
    // pass and the probe slice all read the decoded frame — unpinned,
    // each of the four references re-ran the decode+hash mapPartitions
    // pass over the payload bytes
    val hashed = phashed(s, dir)
      .transform(graft.Checkpoints.truncate)
    // ---- distinct-hash CENSUS first: a 16-bit hash space holds ≤ 65k
    // values, so media corpora repeat hashes massively (exact dups,
    // re-encodes, this fixture's 500k docs over a few hundred hashes) —
    // and the banded search must ride DISTINCT (hash, geometry) rows,
    // never corpus rows, or same-hash crowds multiply into the
    // candidate join (the 100× tier measured 48 min for the row-level
    // form vs seconds for this one). Per census bucket: its doc count,
    // min doc id, and SECOND-min (for self-exclusion when the probe is
    // the bucket's own minimum).
    val census = hashed
      .groupBy(col("phash"), col("width"), col("height"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("m1"))
    val m2 = hashed
      .join(census, Seq("phash", "width", "height"))
      .filter(col("doc_id") =!= col("m1"))
      .groupBy(col("phash"), col("width"), col("height"))
      .agg(min(col("doc_id")).as("m2"))
    val censusFull = census.join(m2, Seq("phash", "width", "height"),
      "left")
    val bandsOf = (c: String) => posexplode(expr(
      s"transform(sequence(0, 3), b -> ($c >> (b * 4)) & 15)"))
      .as(Seq("band", "band_val"))
    val idx = censusFull.select(col("phash").as("nbr_phash"),
      col("width"), col("height"), col("cnt"), col("m1"),
      bandsOf("phash"))
    val probeDocs = hashed.filter(col("doc_id") % 25 === 0)
    // distinct probe hashes — every probe doc sharing a hash shares its
    // whole result modulo self-exclusion, resolved per doc at the end
    val probeHashes = probeDocs
      .select(col("phash").as("p_phash"), col("width"), col("height"))
      .distinct()
      .select(col("p_phash"), col("width"), col("height"),
        bandsOf("p_phash"))
    // hash-level candidates: |distinct probe hashes| × band-bucket
    // mates among DISTINCT hashes — bounded by the hash space, not the
    // corpus. Same-hash (ham=0) buckets are handled separately below
    // because only they can contain the probe doc itself.
    val otherAgg = probeHashes
      .join(idx, Seq("band", "band_val", "width", "height"))
      .filter(col("nbr_phash") =!= col("p_phash"))
      .select(col("p_phash"), col("width"), col("height"),
        col("nbr_phash"), col("cnt"), col("m1"))
      .distinct()
      .withColumn("ham", expr("bit_count(p_phash ^ nbr_phash)"))
      .filter(col("ham") <= 3)
      .select(col("p_phash"), col("width").as("ow"),
        col("height").as("oh"), col("cnt"), col("m1"), col("ham"))
      .groupBy(col("p_phash"), col("ow"), col("oh"))
      .agg(sum(col("cnt")).as("n_other"),
        min(col("ham").cast("long") * lit(4294967296L) + col("m1"))
          .as("bk_other"))
    probeDocs
      .select(col("doc_id").as("probe_id"), col("phash"),
        col("width"), col("height"))
      .join(censusFull, Seq("phash", "width", "height"))
      .join(otherAgg,
        col("phash") === col("p_phash") && col("width") === col("ow") &&
          col("height") === col("oh"),
        "left")
      // own-bucket mates (ham = 0): every other doc with the probe's
      // exact hash; best id among them is m1 unless the probe IS m1
      .withColumn("self_cnt", col("cnt") - 1)
      .withColumn("self_best", when(col("self_cnt") === 0, lit(null))
        .otherwise(when(col("m1") === col("probe_id"), col("m2"))
          .otherwise(col("m1"))))
      .withColumn("n_near",
        coalesce(col("n_other"), lit(0L)) + col("self_cnt"))
      // least() skips nulls: self key is ham·2³² + id with ham = 0
      .withColumn("best_key", least(col("bk_other"), col("self_best")))
      .select(col("probe_id"),
        when(col("n_near") > 0, col("n_near")).otherwise(lit(0L))
          .as("n_near"),
        expr("best_key % 4294967296").as("best_nbr"),
        expr("best_key div 4294967296").as("best_ham"))
      .orderBy(col("probe_id"))
  }

  /** 16-bit perceptual hash over a 16-dim feature vector: bit i set iff
    * bin i sits above the 1/16 uniform-occupancy line (exact 2⁻⁴, a
    * float32-representable constant).
    */
  def phashOf(f: Array[Float]): Long = {
    var h = 0L
    var i = 0
    while (i < 16) {
      if (f(i) > 0.0625f) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Size-capped training-shard assignment (the WebDataset/tar-shard
    * layout step): within each source, media records pack into contiguous
    * shards by running byte total — a record starts a new shard when the
    * bytes before it cross a cap multiple (offset binning: a shard may
    * overrun the cap by at most one record, the standard tar-writer
    * behavior). Emits the per-shard manifest (count, bytes, id range) a
    * downstream loader consumes.
    *
    * Scale shape: the running byte total rides [[WindowOps.spreadRank]]'s
    * weighted two-pass — the per-source prefix sums are spread across the
    * session's shuffle width regardless of how few sources exist (a
    * plain `Window.partitionBy(source)` would serialize each source
    * through one task — the straggler the r4 verdict flagged on
    * low-cardinality window keys). The manifest aggregate collapses to
    * |shards| rows with map-side combine.
    */
  def shardPack(s: SparkSession, dir: String): DataFrame = {
    val cap = 2000L // bytes per shard; fixture-sized — a config in prod
    val sized = mediaTable(s, dir)
      .join(Tables.documents(s, dir).select(col("doc_id"), col("source")),
        "doc_id")
      .select(col("source"), col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"))
    WindowOps.spreadRank(sized, "source", Seq(col("doc_id")),
      s.sessionState.conf.numShufflePartitions, weight = Some("n_bytes"))
      .withColumn("shard_id", expr(s"(__pre - n_bytes) DIV $cap"))
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("shard_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_shard_pack" -> shardPack,
    "mm_meta" -> mmMeta,
    "mm_features" -> mmFeatures,
    "mm_frame_sample" -> mmFrameSample,
    "mm_dedup_phash" -> mmDedupPhash,
    "mm_phash_hamming" -> mmPhashHamming
  )

  val oracle: Map[String, String] = Map(
    "mm_shard_pack" ->
      """WITH d AS (
        |  SELECT source, doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes
        |  FROM documents),
        |c AS (
        |  SELECT *, CAST(sum(n_bytes) OVER (PARTITION BY source
        |         ORDER BY doc_id) AS BIGINT) AS cum
        |  FROM d)
        |SELECT source, (cum - n_bytes) // 2000 AS shard_id,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY source, shard_id""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |            ELSE 'video/mp4' END AS media_type,
        |       CAST((doc_id % 4) * 160 + 320 AS INT) AS width,
        |       CAST((doc_id % 3) * 120 + 240 AS INT) AS height,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       CAST(((doc_id % 4) * 160 + 320) * ((doc_id % 3) * 120 + 240)
        |            * 3 AS INT) AS n_pixels_decoded
        |FROM documents ORDER BY doc_id""".stripMargin,
    // frame_bytes is pure arithmetic over the payload length: frames start
    // every 4·256 bytes, the last (possibly empty) frame is clipped
    "mm_frame_sample" ->
      """SELECT doc_id, frame_idx,
        |       CAST(least(256, octet_length(encode(text)) - frame_idx * 256)
        |            AS INT) AS frame_bytes
        |FROM (
        |  SELECT doc_id, text,
        |         CAST(unnest(generate_series(0,
        |           octet_length(encode(text)) // 256, 4)) AS INT)
        |           AS frame_idx
        |  FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // the full 16-bin float32 histogram replayed per bin, thresholded at
    // the exact 2^-4 constant — the same float32-reproducibility argument
    // as mm_features below, extended to every bit of the hash
    "mm_dedup_phash" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         [ascii(text[i]) // 16
        |          for i in range(1, length(text) + 1)] AS nib,
        |         greatest(octet_length(encode(text)), 1) AS n
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |         CAST(list_sum(
        |           [CASE WHEN CAST(len(list_filter(nib, x -> x = k))
        |                           AS FLOAT) / CAST(n AS FLOAT)
        |                      > CAST(0.0625 AS FLOAT)
        |                 THEN 2 ** k ELSE 0 END
        |            for k in range(0, 16)]) AS BIGINT) AS phash,
        |         CAST((doc_id % 4) * 160 + 320 AS INT) AS width,
        |         CAST((doc_id % 3) * 120 + 240 AS INT) AS height
        |  FROM b)
        |SELECT phash, width, height, count(*) AS n_docs,
        |       min(doc_id) AS keeper_doc
        |FROM h GROUP BY 1, 2, 3 ORDER BY phash, width, height""".stripMargin,
    // the same per-bit phash replay as mm_dedup_phash, then the
    // multi-index search re-derived from first principles: DuckDB skips
    // the banding entirely and scans all same-geometry pairs with the
    // exact xor/bit_count test — an INDEPENDENT route that certifies the
    // pigeonhole candidate generation lost nothing
    "mm_phash_hamming" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         [ascii(text[i]) // 16
        |          for i in range(1, length(text) + 1)] AS nib,
        |         greatest(octet_length(encode(text)), 1) AS n
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |         CAST(list_sum(
        |           [CASE WHEN CAST(len(list_filter(nib, x -> x = k))
        |                           AS FLOAT) / CAST(n AS FLOAT)
        |                      > CAST(0.0625 AS FLOAT)
        |                 THEN 2 ** k ELSE 0 END
        |            for k in range(0, 16)]) AS BIGINT) AS phash,
        |         CAST((doc_id % 4) * 160 + 320 AS INT) AS width,
        |         CAST((doc_id % 3) * 120 + 240 AS INT) AS height
        |  FROM b),
        |cand AS (
        |  SELECT p.doc_id AS probe_id,
        |         x.doc_id AS nbr_id,
        |         bit_count(xor(p.phash, x.phash)) AS ham
        |  FROM h p JOIN h x
        |    ON p.width = x.width AND p.height = x.height
        |   AND p.doc_id != x.doc_id
        |  WHERE p.doc_id % 25 = 0
        |    AND bit_count(xor(p.phash, x.phash)) <= 3),
        |best AS (
        |  SELECT probe_id, count(*) AS n_near,
        |         min(CAST(ham AS BIGINT) * 4294967296 + nbr_id) AS bk
        |  FROM cand GROUP BY 1)
        |SELECT h.doc_id AS probe_id,
        |       coalesce(best.n_near, 0) AS n_near,
        |       bk % 4294967296 AS best_nbr,
        |       bk // 4294967296 AS best_ham
        |FROM h LEFT JOIN best ON h.doc_id = best.probe_id
        |WHERE h.doc_id % 25 = 0
        |ORDER BY probe_id""".stripMargin,
    // the stub decoder is a 16-bin high-nibble byte histogram normalized
    // in FLOAT32; the text is pure ASCII (byte == codepoint), so the same
    // float division is reproducible in SQL — CAST AS FLOAT keeps the
    // arithmetic in float32 and the resulting doubles bit-identical
    "mm_features" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       CAST(CAST(len(list_filter(range(1, length(text) + 1),
        |              i -> ascii(text[i]) // 16 = 0)) AS FLOAT) /
        |            CAST(greatest(octet_length(encode(text)), 1) AS FLOAT)
        |            AS DOUBLE) AS f0,
        |       CAST(CAST(len(list_filter(range(1, length(text) + 1),
        |              i -> ascii(text[i]) // 16 = 1)) AS FLOAT) /
        |            CAST(greatest(octet_length(encode(text)), 1) AS FLOAT)
        |            AS DOUBLE) AS f1
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
