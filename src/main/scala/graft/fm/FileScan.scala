package graft.fm

import java.nio.file.{FileSystems, Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Glob file scan (reference `server.py:32-36`): expand a glob pattern
  * (recursive `**`) under a base directory, keep regular files only.
  *
  * Listing is driver-side like the reference; at 100 TB this becomes a
  * FileSystem listing against object storage and the parse stage (which is
  * distributed, see [[Corpus]]) is unaffected. Results are path-sorted so
  * record order — and therefore `query_inspect`'s first-seen example
  * order — is deterministic.
  */
object FileScan {

  /** Relative paths (unix separators) of regular files under `baseDir`
    * matching `glob`, sorted.
    */
  def collect(baseDir: Path, glob: String): Seq[Path] = {
    if (!Files.isDirectory(baseDir)) return Seq.empty
    val fs = FileSystems.getDefault
    val matchers =
      // Python glob("**/x", recursive=True) also matches zero directories
      // deep; Java's "**/" requires one. Add the stripped variant.
      if (glob.startsWith("**/"))
        Seq(glob, glob.stripPrefix("**/")).map(g => fs.getPathMatcher(s"glob:$g"))
      else Seq(fs.getPathMatcher(s"glob:$glob"))
    val stream = Files.walk(baseDir)
    try {
      stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(baseDir.relativize)
        .filter(rel => matchers.exists(_.matches(rel)))
        .toSeq
        .sortBy(_.toString)
    } finally stream.close()
  }

  /** Absolute + relative path pairs with mtimes, for cache fingerprints. */
  def collectWithMtime(baseDir: Path, glob: String): Seq[(String, Long)] =
    collect(baseDir, glob).map { rel =>
      (rel.toString, Files.getLastModifiedTime(baseDir.resolve(rel)).toMillis)
    }

  /** Path sandbox (reference `_resolve_path`, `server.py:60-84`): resolve
    * `relPath` against `baseDir`, reject escapes, require existence.
    */
  def resolve(baseDir: Path, relPath: String): Path = {
    val abs = resolveForWrite(baseDir, relPath)
    if (!Files.exists(abs))
      throw new java.io.FileNotFoundException(s"File not found: $relPath")
    abs
  }

  /** The containment half of [[resolve]] alone — for targets that need
    * not exist yet (COPY ... TO). ONE implementation of the sandbox
    * check, so a hardening fix lands on every path that writes or reads
    * under the base dir.
    */
  def resolveForWrite(baseDir: Path, relPath: String): Path = {
    val abs = baseDir.resolve(relPath).normalize()
    if (!abs.startsWith(baseDir.normalize()))
      throw new IllegalArgumentException(s"Path must be within base directory: $relPath")
    abs
  }
}
