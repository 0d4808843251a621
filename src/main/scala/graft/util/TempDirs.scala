package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

/** Process-lifetime temp-directory registry: one shutdown hook deletes
  * every registered tree, so repeated Verify/Bench/test runs never
  * accumulate staged copies in /tmp. Deletion is best-effort — a
  * failure to delete one tree must not abort the others (or the JVM's
  * shutdown). */
object TempDirs {

  private val registered = new ConcurrentLinkedQueue[String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registered.forEach { dir =>
      try {
        Files.walk(Paths.get(dir))
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
      } catch { case _: Throwable => }
    }
  }))

  /** Create a fresh temp directory cleaned up at JVM exit. */
  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p.toString)
    p
  }

  /** Register an existing directory for exit-time deletion. */
  def register(path: String): String = { registered.add(path); path }
}
