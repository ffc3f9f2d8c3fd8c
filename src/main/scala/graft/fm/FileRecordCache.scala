package graft.fm

import java.nio.file.{Files, Path}
import scala.collection.concurrent.TrieMap

/** mtime-keyed parse cache (reference `FileRecordCache`, `files.py:19-49`):
  * skip re-parsing a file whose `(relPath, mtime)` is unchanged.
  *
  * Driver-side component for the local parse path and the mutation tools;
  * the distributed query path uses a corpus fingerprint instead (see
  * [[Corpus.fingerprint]]) which is the Spark-shaped analogue.
  */
final class FileRecordCache {
  private case class Entry(mtimeMillis: Long, record: Map[String, Any])
  private val cache = TrieMap.empty[String, Entry]

  private def mtimeOf(path: Path): Option[Long] =
    try Some(Files.getLastModifiedTime(path).toMillis)
    catch { case _: java.io.IOException => None }

  def get(path: Path, baseDir: Path): Option[Map[String, Any]] = {
    val rel = baseDir.relativize(path).toString
    for {
      mtime <- mtimeOf(path)
      entry <- cache.get(rel) if entry.mtimeMillis == mtime
    } yield entry.record
  }

  def set(path: Path, baseDir: Path, record: Map[String, Any]): Unit = {
    val rel = baseDir.relativize(path).toString
    mtimeOf(path).foreach(m => cache.put(rel, Entry(m, record)))
  }

  def invalidate(paths: Seq[Path], baseDir: Path): Unit =
    paths.foreach(p => cache.remove(baseDir.relativize(p).toString))

  def size: Int = cache.size
}
