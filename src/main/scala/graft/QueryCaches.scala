package graft

import scala.collection.concurrent.TrieMap

/** Central registry of the per-(session, dir) memo caches the query
  * families keep (loaded tables, trained centroids/codebooks, signature
  * and edge frames). The cached DataFrames pin their EXECUTED plans —
  * including materialized broadcast hash relations, which live on the
  * driver — so a long-running session that walks many directories (the
  * scale probe, a multi-tenant service) needs an eviction hook or driver
  * memory grows with the number of corpora visited, not with any single
  * one.
  *
  * Eviction releases what the entries pin, not just the map slots:
  * Dataset values (and Datasets nested in tuple values) are unpersisted
  * so their cached blocks and driver-side broadcast relations are freed
  * without requiring a separate `spark.catalog.clearCache()` — a global
  * catalog flush would also evict caches belonging to OTHER corpora
  * still in use (ADVICE r13).
  *
  * Two granularities:
  *   - `evict(sessionKey, dir)` / `evict(dir)` — drop one corpus's
  *     entries; other corpora keep their trained state (a multi-corpus
  *     service must not retrain everything on every eviction).
  *   - `clearAll()` — drop everything (probe teardown, session end).
  *
  * Every cache key in the codebase is either the dir String itself or a
  * tuple whose first two elements are (Tables.sessionKey, dir); the
  * per-dir match relies on that shape.
  */
object QueryCaches {
  private val registry = scala.collection.mutable.ArrayBuffer.empty[TrieMap[_, _]]

  def register[K, V](m: TrieMap[K, V]): TrieMap[K, V] = synchronized {
    registry += m
    m
  }

  /** Unpersist any Dataset a cache value pins (directly or inside a
    * tuple). Blocks are dropped asynchronously; the entry is already
    * unlinked so a re-query retrains rather than observing a
    * half-unpersisted frame.
    */
  private def release(v: Any): Unit = v match {
    case ds: org.apache.spark.sql.Dataset[_] =>
      try ds.unpersist(blocking = false)
      catch { case _: Exception => () } // session already stopped
    case p: Product => p.productIterator.foreach(release)
    case _ => ()
  }

  private def keyMatches(k: Any, sessionKey: Option[Int], dir: String): Boolean =
    k match {
      case s: String => sessionKey.isEmpty && s == dir
      case p: Product if p.productArity >= 2 =>
        p.productElement(1) == dir &&
          sessionKey.forall(sk => p.productElement(0) == sk)
      case _ => false
    }

  /** Evict one corpus in one session; entries of other (session, dir)
    * pairs — including the same dir under another session — survive.
    */
  def evict(sessionKey: Int, dir: String): Unit = evictWhere(Some(sessionKey), dir)

  /** Evict one corpus across all sessions. */
  def evict(dir: String): Unit = evictWhere(None, dir)

  private def evictWhere(sessionKey: Option[Int], dir: String): Unit = synchronized {
    registry.foreach { m =>
      val mm = m.asInstanceOf[TrieMap[Any, Any]]
      mm.keySet.foreach { k =>
        if (keyMatches(k, sessionKey, dir)) mm.remove(k).foreach(release)
      }
    }
  }

  def clearAll(): Unit = synchronized {
    registry.foreach { m =>
      m.values.foreach(release)
      m.clear()
    }
  }
}
