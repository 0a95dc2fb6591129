package graft

/** Temp-dir lifecycle for query-site artifacts (persisted indexes, CDC
  * dimensions): the artifact must OUTLIVE the method that builds it — the
  * returned frame reads it lazily — so the earliest safe reclaim point is
  * JVM exit. Shared by q111/q132-style round-trip queries. */
object TempDirs {
  /** Create a temp directory removed by a shutdown hook at JVM exit. */
  def scratchAtExit(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook(rmTree(p))
    p
  }

  def rmTree(p: java.nio.file.Path): Unit = {
    val f = p.toFile
    if (f.isDirectory) f.listFiles().foreach(c => rmTree(c.toPath))
    f.delete()
  }
}
