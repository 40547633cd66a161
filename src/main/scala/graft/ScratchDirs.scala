package graft

import java.nio.file.{Files, Path}
import scala.collection.concurrent.TrieMap

/** Session-scoped scratch directories for the persisted-index lifecycle
  * queries (`q_sim_pq_indexed`, `q_sim_ivf_indexed`, `q_dedup_indexed`):
  * one directory PER KEY PER JVM, handed back on every call — repeated
  * invocations (benchmark rounds, re-runs) overwrite the same index via
  * the writers' `mode("overwrite")` instead of accumulating a fresh
  * corpus-sized copy under /tmp each time — and the whole tree is deleted
  * on JVM exit.
  *
  * Production indexes live at durable paths the caller chooses; this is
  * only the self-contained-query binding.
  */
object ScratchDirs {

  private val dirs = TrieMap.empty[String, String]

  /** The stable scratch directory for `key`, created (and registered for
    * exit-time deletion) on first use.
    */
  def apply(key: String): String = dirs.getOrElseUpdate(key, {
    val p = Files.createTempDirectory(s"graft-$key-")
    sys.addShutdownHook(deleteRecursively(p))
    p.toString
  })

  private def deleteRecursively(root: Path): Unit = {
    if (Files.exists(root)) {
      val stream = Files.walk(root)
      try
        stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      finally stream.close()
    }
  }
}
