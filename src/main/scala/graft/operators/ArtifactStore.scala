package graft.operators

/** Per-fixture artifact-store cache shared by every `_served` query
  * (BPE merge table, dedup label store, incremental-cluster store, SRP
  * bits table). Build-once-read-thereafter is the point of the serving
  * twins — but a JVM-static cache keyed on the fixture DIRECTORY alone
  * silently serves stale artifacts if the fixture at that path is
  * regenerated within one JVM (the advisor's round-11 finding). So the
  * key is canonical dir PLUS a content fingerprint (file count + max
  * mtime + TOTAL BYTES over the fixture tree — cheap: fixture dirs hold
  * a handful of parquet part files; the byte total catches a fixture
  * regenerated with the same part count inside one mtime granule, the
  * same hazard Tables.documentsCount's cache key hardened against), and
  * every temp dir is registered for recursive deletion on JVM exit
  * instead of leaking into /tmp.
  */
private[operators] object ArtifactStore {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def fingerprint(dir: java.io.File): String = {
    def walk(f: java.io.File): (Long, Long, Long) =
      if (f.isDirectory) {
        val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        kids.foldLeft((0L, 0L, 0L)) { case ((n, m, b), k) =>
          val (kn, km, kb) = walk(k)
          (n + kn, math.max(m, km), b + kb)
        }
      } else (1L, f.lastModified(), f.length())
    val (n, m, b) = walk(dir)
    s"$n:$m:$b"
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Path of the artifact root for (storeName, fixtureDir), building it
    * at most once per (store, dir, fixture-fingerprint) by running
    * `build(outRoot)`. A regenerated fixture changes the fingerprint and
    * triggers a fresh build; the superseded temp dir lingers only until
    * the exit hook sweeps it.
    */
  def cached(storeName: String, fixtureDir: String)(
      build: String => Unit): String = {
    val f = new java.io.File(fixtureDir)
    val key = s"$storeName|${f.getCanonicalPath}|${fingerprint(f)}"
    cache.computeIfAbsent(key, { _ =>
      val out = java.nio.file.Files.createTempDirectory(s"graft_$storeName")
      val outFile = out.toFile
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => deleteRecursively(outFile)))
      build(out.toString)
      out.toString
    })
  }
}
