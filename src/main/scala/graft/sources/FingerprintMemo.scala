package graft.sources

import org.apache.spark.sql.SparkSession

/** In-process memo keyed by (session, location tag, variant) whose
  * entries are VALIDATED by a corpus fingerprint. The fingerprint rolls
  * whenever the underlying table is rewritten, so an entry built against
  * the old corpus can never be served again — which also means keeping
  * it is a pure leak: before this class, the dedup/BM25 memos keyed on
  * the fingerprint itself, so a corpus regeneration mid-process left the
  * stale entry (and its persisted candidate-pair RDDs / localCheckpoint
  * blocks) pinned for the JVM lifetime. A lookup whose fingerprint
  * differs from the stored entry's rebuilds, REPLACES the entry, and
  * releases the stale value through `onEvict` — at most one live entry
  * per (session, tag, variant).
  *
  * Concurrency: the decision section is serialized (builds are rare —
  * once per corpus snapshot), but the build itself runs outside the
  * lock so Spark jobs never execute under it; if two threads race the
  * same build, the loser's freshly built value is released through
  * `onEvict` and the winner's is served to both.
  */
private[graft] final class FingerprintMemo[V](onEvict: V => Unit) {
  private val m = scala.collection.mutable.Map
    .empty[(SparkSession, String, String), (String, V)]

  def getOrBuild(s: SparkSession, tag: String, variant: String,
      fingerprint: String)(build: => V): V = {
    val key = (s, tag, variant)
    m.synchronized(m.get(key)) match {
      case Some((f, v)) if f == fingerprint => v
      case _ =>
        val built = build
        m.synchronized {
          // a stopped session's entries can never be served again either
          // — purge them so the memo cannot pin dead SparkSessions (no
          // onEvict: unpersist needs the very context that is gone)
          m.filterInPlace { case ((sess, _, _), _) =>
            (sess eq s) || !sess.sparkContext.isStopped
          }
          m.get(key) match {
            case Some((f, v)) if f == fingerprint =>
              // a racer installed the same snapshot first — serve its
              // value and release the duplicate we just built
              onEvict(built); v
            case stale =>
              stale.foreach { case (_, v) => onEvict(v) }
              m.put(key, (fingerprint, built))
              built
          }
        }
    }
  }

  /** Number of live entries — spec hook. */
  private[graft] def size: Int = m.synchronized(m.size)
}
