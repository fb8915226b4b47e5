package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SensorGenerator
import graft.streaming.{Multiplexer, Wiretap}

/** Reference operators #2 (1:2 Multiplexer) and #9 (Wiretap) in their
  * Spark-native forms.
  */
class WiretapSpec extends SparkSpec {

  test("wiretap observes count and offset range without a second scan") {
    val recorder = Wiretap.install(spark)
    val df = Wiretap.tap(
      SensorGenerator.batch(spark, 50, 10), "wt1", "counter")
    df.write.format("noop").mode("overwrite").save()
    // listener fires asynchronously after the action completes
    val deadline = System.currentTimeMillis() + 10000
    var tap: Option[Wiretap.Tap] = None
    while (tap.isEmpty && System.currentTimeMillis() < deadline) {
      tap = recorder.taps.toArray(Array.empty[Wiretap.Tap])
        .find(_.name == "wt1")
      if (tap.isEmpty) Thread.sleep(100)
    }
    assert(tap.isDefined, "wiretap metrics not observed")
    assert(tap.get.metrics("n_rows") === 50L)
    assert(tap.get.metrics("min_key") === 10L)
    assert(tap.get.metrics("max_key") === 59L)
  }

  test("multiplexer fans one scan out to two sinks with equal content") {
    val base = Files.createTempDirectory("graft_mux").toString
    val src = SensorGenerator.batch(spark, 100)
    Multiplexer.fanOut(src)(
      _.write.mode("overwrite").parquet(s"$base/a"),
      _.write.mode("overwrite").parquet(s"$base/b"))
    val a = spark.read.parquet(s"$base/a")
    val b = spark.read.parquet(s"$base/b")
    assert(a.count() === 100 && b.count() === 100)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
