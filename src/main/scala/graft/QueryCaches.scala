package graft

import scala.collection.concurrent.TrieMap

/** Central registry of the per-(session, dir) memo caches the query
  * families keep (loaded tables, trained centroids/codebooks, signature
  * and edge frames). The cached DataFrames pin their EXECUTED plans —
  * including materialized broadcast hash relations, which live on the
  * driver — so a long-running session that walks many directories (the
  * scale probe, a multi-tenant service) needs an eviction hook or driver
  * memory grows with the number of corpora visited, not with any single
  * one. `clearAll()` drops every registered cache; the next query on a
  * dir simply retrains/reloads.
  */
object QueryCaches {
  private val registry = scala.collection.mutable.ArrayBuffer.empty[TrieMap[_, _]]

  def register[K, V](m: TrieMap[K, V]): TrieMap[K, V] = synchronized {
    registry += m
    m
  }

  def clearAll(): Unit = synchronized {
    registry.foreach(_.clear())
  }
}
