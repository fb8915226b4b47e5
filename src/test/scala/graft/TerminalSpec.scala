package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.SensorGenerator
import graft.streaming.Terminal

/** The Terminal operator twin: console display of a passing stream, and
  * the input port delivering typed lines downstream (the reference uses it
  * to trip the Simulate Error operator — README.md:80–82).
  */
class TerminalSpec extends SparkSpec {

  test("display: a stream renders to the console sink and terminates") {
    val base = Files.createTempDirectory("graft_term_disp").toString
    SensorGenerator.batch(spark, 3).coalesce(1)
      .write.mode("overwrite").parquet(s"$base/src")
    val schema = spark.read.parquet(s"$base/src").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/src")
    val q = Terminal.display(stream, numRows = 3)
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.exception.isEmpty)
  }

  // Regression for the publish protocol: inject must leave exactly the
  // visible, fully-written line files — no temp residue that a later
  // directory listing would pick up, and no partially-written visible file
  // (the write lands in a hidden .tmp the file source ignores, then an
  // atomic same-directory rename makes it visible).
  test("inject publishes via atomic rename: whole files, no temp residue") {
    val spool = Files.createTempDirectory("graft_term_atomic").toString
    (1 to 20).foreach(i => Terminal.inject(spool, s"line $i"))
    val all = new java.io.File(spool).listFiles().toSeq
    val visible = all.filterNot(_.getName.startsWith("."))
    assert(all.size === visible.size, "no hidden temp files may remain")
    assert(visible.size === 20)
    val contents = visible.map(f =>
      new String(Files.readAllBytes(f.toPath), "UTF-8")).sorted
    assert(contents === (1 to 20).map(i => s"line $i\n").sorted,
      "every visible file must carry its complete line")
  }

  test("input port: injected lines arrive downstream as the signal stream") {
    val base = Files.createTempDirectory("graft_term_in").toString
    val spool = s"$base/spool"
    Terminal.inject(spool, "anything typed")
    Terminal.inject(spool, "kill")
    val q = Terminal.input(spark, spool)
      .writeStream.format("memory").queryName("term_lines")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val lines = spark.table("term_lines").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(lines === Seq("anything typed", "kill"))
    // the Simulate Error wiring: ANY line on the debug port arms the
    // injector (README.md:80-82's `terminate = true`)
    val armed = spark.table("term_lines").limit(1).count() > 0
    assert(armed)
  }
}
