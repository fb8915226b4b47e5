package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.TextOps
import graft.streaming.StreamingBpeEncode

/** Streaming BPE encode: the live tokenizer stage emits exactly the
  * batch serving path's rows, across micro-batch boundaries, from a
  * persisted merge table.
  */
class StreamingBpeEncodeSpec extends SparkSpec {

  test("stream encode over the fixture corpus equals the batch apply " +
    "row-for-row, with the merge table round-tripped through parquet") {
    val base = Files.createTempDirectory("graft_sbpe").toString
    // the persisted tokenizer artifact, as a serving deployment ships it
    val mergePath = s"$base/merges.parquet"
    TextOps.bpeTrain(spark, sf0001).write.mode("overwrite")
      .parquet(mergePath)
    val mergeTable = spark.read.parquet(mergePath)
    // split the corpus into several files so the stream replays in
    // multiple micro-batches — the boundary must be invisible
    val src = s"$base/src"
    Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
      .repartition(3).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = StreamingBpeEncode.encoded(stream, mergeTable)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("bpe_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val want = TextOps.bpeApply(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(want.nonEmpty)
    assert(got.toSeq === want.toSeq)
  }
}
