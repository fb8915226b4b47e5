package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** The reference's Terminal operator (reference README.md:44,
  * images/terminal.png): a console window that both DISPLAYS the stream
  * flowing past and accepts typed input forwarded downstream — the blog
  * uses the input side to send the termination signal into the Simulate
  * Error operator (README.md:80–82).
  *
  * Spark-native twins:
  *  - display side → the `console` sink (per-micro-batch rows printed to
  *    the driver's stdout, the same operational role);
  *  - input side → a line stream over a spool directory: [[inject]] is one
  *    "keystroke" (a one-line file published via write-then-atomic-rename,
  *    so a reader never sees a torn line), [[input]] the stream delivering the
  *    typed lines downstream, where a fault injector or control flow can
  *    react to them. A spool directory rather than a socket keeps the
  *    harness hermetic and replayable (the socket source is not
  *    fault-tolerant; the file source is).
  */
object Terminal {

  /** Display side: attach a console sink to a streaming frame. */
  def display(df: DataFrame, numRows: Int = 20): DataStreamWriter[Row] =
    df.writeStream.format("console")
      .option("numRows", numRows.toString)
      .option("truncate", "false")

  /** Input side: the terminal's input port — a stream of typed lines
    * (column `value`) from the spool directory.
    */
  def input(spark: SparkSession, spoolDir: String): DataFrame = {
    Files.createDirectories(Paths.get(spoolDir))
    spark.readStream.option("maxFilesPerTrigger", "1").text(spoolDir)
  }

  /** Type one line into the terminal: add a single-line file to the spool.
    *
    * Written to a dot-prefixed temp file first (Spark's file source ignores
    * hidden files), then ATOMIC_MOVE-renamed into its final name in the
    * same directory — a directory-local rename is atomic on every POSIX
    * filesystem, so the file only becomes visible fully written. A direct
    * `Files.write(CREATE_NEW)` would expose the path before its bytes
    * land, and the file source never re-reads a file it already listed —
    * the injected line (e.g. the kill signal) would be silently lost.
    */
  def inject(spoolDir: String, line: String): Unit = {
    Files.createDirectories(Paths.get(spoolDir))
    val id = java.util.UUID.randomUUID()
    val tmp = Paths.get(spoolDir, s".line-$id.tmp")
    Files.write(tmp, (line + "\n").getBytes("UTF-8"))
    Files.move(tmp, Paths.get(spoolDir, s"line-$id.txt"),
      StandardCopyOption.ATOMIC_MOVE)
  }
}
