package graft

import org.apache.spark.sql.functions._

import graft.operators.CurationOps

/** Value-level checks for the curation passes (the DuckDB oracle gates
  * full parity; these pin the semantics that matter).
  */
class CurationSpec extends SparkSpec {

  test("llm_decontaminate: benchmark docs never flag themselves; hits share a real n-gram") {
    val rows = CurationOps.decontaminate(spark, sf0001).collect()
    assert(rows.nonEmpty, "fixture must produce contamination overlap")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 97 !== 0L,
        "a benchmark doc leaked into the contaminated set")
      assert(r.getAs[Long]("first_bench") % 97 === 0L)
      assert(r.getAs[Long]("n_shared") >= 1L)
    }
    // spot-check one hit end-to-end: the doc and its first_bench really
    // share a 3-gram
    val hit = rows.head
    val texts = Tables.documents(spark, sf0001)
      .filter(col("doc_id").isin(hit.getAs[Long]("doc_id"),
        hit.getAs[Long]("first_bench")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    def grams3(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    assert((grams3(texts(hit.getAs[Long]("doc_id"))) &
      grams3(texts(hit.getAs[Long]("first_bench")))).nonEmpty)
  }

  test("llm_pii_scrub: injected PII is counted and fully redacted") {
    val rows = CurationOps.piiScrub(spark, sf0001).collect()
    rows.foreach { r =>
      val injected = r.getAs[Long]("doc_id") % 5 == 0
      val clean = r.getAs[String]("clean_text")
      if (injected) {
        assert(r.getAs[Int]("n_emails") >= 1)
        assert(r.getAs[Int]("n_phones") >= 1)
        assert(clean.contains("<EMAIL>") && clean.contains("<PHONE>"))
      } else {
        assert(r.getAs[Int]("n_emails") === 0)
        assert(r.getAs[Int]("n_phones") === 0)
      }
      assert(!clean.contains("@example.com"),
        s"unredacted email survives in doc ${r.getAs[Long]("doc_id")}")
      assert(!clean.matches(".*555-[0-9]{4}.*"),
        s"unredacted phone survives in doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("llm_pack_sequences: contiguous token stream per shard, exact placement") {
    val rows = CurationOps.packSequences(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("offset"),
        r.getAs[Int]("n_tokens"), r.getAs[Boolean]("crosses")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._2).foreach { case (_, id, seq, off, n, crosses) =>
        assert(seq === cum / 512, s"doc $id seq_id")
        assert(off === cum % 512, s"doc $id offset")
        assert(crosses === (cum % 512 + n > 512), s"doc $id crosses")
        cum += n
      }
    }
    // conservation: every token is placed exactly once
    val placed = rows.map(_._5.toLong).sum
    val total = Tables.documents(spark, sf0001)
      .selectExpr("CAST(sum(size(split(text, ' '))) AS BIGINT)")
      .head().getLong(0)
    assert(placed === total)
  }

  test("llm_corpus_prepare: survivors exclude benchmark/contaminated/repetitive; packing contiguous") {
    import graft.operators.PipelineOps
    val prep = PipelineOps.corpusPrepare(spark, sf0001).collect()
    assert(prep.nonEmpty)
    val ids = prep.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.forall(_ % 97 != 0), "a benchmark doc reached training data")
    val contaminated = CurationOps.decontaminate(spark, sf0001).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert((ids & contaminated).isEmpty, "a contaminated doc survived")
    val cleanIds = PipelineOps.corpusClean(spark, sf0001).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ids.subsetOf(cleanIds), "prepare emitted a doc clean rejected")
    prep.groupBy(_.getAs[Long]("shard")).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("seq_id") === cum / 512)
        assert(r.getAs[Long]("offset") === cum % 512)
        cum += r.getAs[Int]("n_tokens")
      }
    }
  }

  test("llm_chunk_windows: full coverage, 25% overlap, doc reconstructs") {
    val docs = Tables.documents(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").toSeq).toMap
    val chunks = CurationOps.chunkWindows(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk_text").split(" ").toSeq))
      .groupBy(_._1)
    assert(chunks.keySet === docs.keySet)
    chunks.foreach { case (id, cs) =>
      val toks = docs(id)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong),
        s"doc $id chunk indices not contiguous")
      assert(sorted.length === (toks.length + 23) / 24)
      sorted.foreach { case (_, idx, ct) =>
        val start = idx.toInt * 24
        assert(ct === toks.slice(start, start + 32), s"doc $id chunk $idx")
      }
      // stride-prefixes reconstruct the document exactly
      val rebuilt = sorted.flatMap { case (_, _, ct) => ct.take(24) }
      assert(rebuilt.toSeq === toks, s"doc $id does not reconstruct")
    }
  }

  test("scrubFrame runs unchanged on a STREAM — stateless narrow curation") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_spii").toString
    Seq(
      (1L, "hello there contact me at someone@mail.example now"),
      (2L, "clean doc nothing to redact"),
      (3L, "mixed case works too John_Doe+spam@Example.COM indeed"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/src")
    val schema = spark.read.parquet(s"$base/src").schema
    val q = graft.operators.CurationOps
      .scrubFrame(spark.readStream.schema(schema).parquet(s"$base/src"))
      .writeStream.format("memory").queryName("pii_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("pii_stream").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[String]("clean_text"))).toMap
    assert(rows(1L)._1 === 1)
    assert(rows(1L)._2.contains("<EMAIL>") && !rows(1L)._2.contains("@"))
    assert(rows(2L) === (0, "clean doc nothing to redact"))
    // the reusable API must catch mixed-case and _/+ local parts too
    assert(rows(3L)._1 === 1)
    assert(rows(3L)._2.contains("<EMAIL>") && !rows(3L)._2.contains("@"))
  }

  test("scrubFrame: near-miss address — count and redaction agree (no parser backslash loss)") {
    import spark.implicits._
    // 'x@ab cd' is NOT an email (no dot-separated TLD). If the pattern
    // ever travels through a SQL string literal again, the parser strips
    // the \ off \. and the count path matches 'ab<space>cd' while the
    // redaction path (literal dot) does not — count 1, redactions 0.
    val rows = graft.operators.CurationOps.scrubFrame(
      Seq((1L, "write to x@ab cd today"),
        (2L, "real one a@b.co here"))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[String]("clean_text"))).toMap
    assert(rows(1L) === (0, "write to x@ab cd today"))
    assert(rows(2L)._1 === 1)
    assert(rows(2L)._2 === "real one <EMAIL> here")
    // invariant the ADVICE finding is about: n_emails counts exactly the
    // substrings redaction replaces
    rows.values.foreach { case (n, clean) =>
      assert(n === "<EMAIL>".r.findAllIn(clean).length)
    }
  }

  test("curation ops on an empty corpus return empty, not errors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cur0").toString
    Tables.documents(spark, sf0001).filter(lit(false))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(CurationOps.decontaminate(spark, dir).count() === 0)
    assert(CurationOps.piiScrub(spark, dir).count() === 0)
    assert(CurationOps.repetition(spark, dir).count() === 0)
    assert(CurationOps.packSequences(spark, dir).count() === 0)
    assert(CurationOps.chunkWindows(spark, dir).count() === 0)
  }

  test("llm_repetition: fractions bounded, verdict consistent, hand-check") {
    import spark.implicits._
    val rows = CurationOps.repetition(spark, sf0001).collect()
    assert(rows.length === Tables.documents(spark, sf0001).count())
    rows.foreach { r =>
      val dt = r.getAs[Double]("dup_token_frac")
      val dg = r.getAs[Double]("dup_3gram_frac")
      assert(dt >= 0.0 && dt < 1.0)
      assert(dg >= 0.0 && dg < 1.0)
      assert(r.getAs[Boolean]("flagged") === (dg > 0.05))
    }
    // a maximally repetitive doc must be flagged with the exact fractions;
    // a doc too short to form a 3-gram carries no repetition evidence and
    // must NOT be flagged (it would silently drop all short docs)
    val dir = java.nio.file.Files.createTempDirectory("graft_rep").toString
    Seq((0L, "spam spam spam spam spam spam", "en", "src0", 29L),
      (1L, "tiny doc", "en", "src0", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val reps = CurationOps.repetition(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(reps(0L).getAs[Double]("dup_token_frac") === 1.0 - 1.0 / 6)
    assert(reps(0L).getAs[Double]("dup_3gram_frac") === 1.0 - 1.0 / 4)
    assert(reps(0L).getAs[Boolean]("flagged"))
    assert(reps(1L).getAs[Double]("dup_3gram_frac") === 0.0)
    assert(!reps(1L).getAs[Boolean]("flagged"))
  }
}
