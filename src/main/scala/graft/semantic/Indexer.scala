package graft.semantic

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicReference

import graft.fm.Frontmatter

/** Indexer states (reference `semantic/indexer.py:14-19`). */
object IndexerState extends Enumeration {
  val Idle = Value("idle")
  val Indexing = Value("indexing")
  val Ready = Value("ready")
}

/** Background differential embedding indexer (reference
  * `semantic/indexer.py:54-162`): diffs the corpus against the cache by
  * mtime, embeds stale bodies, drops vanished paths, then flushes a new
  * snapshot and transitions to READY. Queries only see embeddings after
  * READY (`server.py:157`).
  */
final class EmbeddingIndexer(
    cache: EmbeddingCache,
    encode: String => Array[Float],
    getFiles: () => Seq[Path],
    baseDir: Path) {

  private val stateRef = new AtomicReference(IndexerState.Idle)
  @volatile private var thread: Thread = _

  def state: IndexerState.Value = stateRef.get()

  /** Start background indexing; no-op with a message when already
    * running (`indexer.py:64-88`).
    */
  def start(): Map[String, Any] = synchronized {
    if (stateRef.get() == IndexerState.Indexing)
      return Map("state" -> state.toString, "message" -> "Indexing already in progress")
    val files = getFiles()
    stateRef.set(IndexerState.Indexing)
    val t = new Thread(() => {
      try indexFiles(files)
      finally stateRef.set(IndexerState.Ready)
    })
    t.setDaemon(true)
    thread = t
    t.start()
    Map(
      "state" -> state.toString,
      "message" -> "Indexing started",
      "target_count" -> files.length)
  }

  private def indexFiles(files: Seq[Path]): Unit = {
    val current: Map[String, Long] = files.flatMap { p =>
      try Some(baseDir.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis)
      catch { case _: Exception => None }
    }.toMap

    cache.getDeletedPaths(current).foreach(cache.delete)

    cache.getStalePaths(current).foreach { rel =>
      try {
        val content = Frontmatter.load(baseDir.resolve(rel)).content.strip()
        if (content.nonEmpty) cache.set(rel, current(rel), encode(content))
      } catch {
        case _: Exception => () // skip unprocessable files (indexer.py:128-131)
      }
    }
    cache.flush()
  }

  /** Wait for completion (`indexer.py:148-162`). */
  def await(timeoutMillis: Long = 60000): Boolean = {
    val t = thread
    if (t == null) return true
    t.join(timeoutMillis)
    !t.isAlive
  }
}
