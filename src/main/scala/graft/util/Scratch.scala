package graft.util

/** Temp directories for queries that exercise sink+source lifecycles.
  * Registered for recursive deletion at JVM exit — each invocation
  * writes a serialized table copy, and a long bench session would
  * otherwise accumulate gigabytes in the system temp dir.
  */
object Scratch {
  def dir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      try rm(d) catch { case _: Exception => () }
    }))
    d.toString
  }
}
