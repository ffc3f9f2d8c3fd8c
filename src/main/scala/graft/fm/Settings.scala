package graft.fm

import java.nio.file.{Files, Path, Paths}

/** Env-derived settings (reference `settings.py:12-51`): same variable
  * names, same defaults, same base-dir existence check.
  */
final case class Settings(
    baseDirRaw: String,
    enableSemantic: Boolean,
    embeddingModel: String,
    cacheDirRaw: Option[String]) {

  def baseDir: Path = {
    val p = Paths.get(baseDirRaw).toAbsolutePath.normalize()
    if (!Files.isDirectory(p))
      throw new RuntimeException(s"Base directory does not exist: $p")
    p
  }

  /** `.frontmatter-mcp` under the base dir unless overridden. */
  def cacheDir: Path =
    cacheDirRaw.map(Paths.get(_)).getOrElse(baseDir.resolve(Settings.DefaultCacheDirName))
}

object Settings {
  val DefaultCacheDirName = ".frontmatter-mcp"
  val DefaultEmbeddingModel = "cl-nagoya/ruri-v3-30m"

  /** Cap on driver-materialized path/warning LISTS (builder extension,
    * env `FRONTMATTER_MAX_LIST`). The reference returns the full
    * updated-files and parse-warning lists (`server.py:49-57`), which
    * is kept verbatim below the cap — but a glob matching 10⁹ files
    * would OOM the driver building the response, so above the cap the
    * APIs return exact COUNTS plus the first N entries and say so.
    */
  val DefaultMaxListed = 10000
  def maxListed(env: Map[String, String] = sys.env): Int =
    env.get("FRONTMATTER_MAX_LIST").map(_.toInt).getOrElse(DefaultMaxListed)

  def fromEnv(env: Map[String, String] = sys.env): Settings = Settings(
    baseDirRaw = env.getOrElse("FRONTMATTER_BASE_DIR",
      throw new RuntimeException("FRONTMATTER_BASE_DIR is required")),
    enableSemantic = env.get("FRONTMATTER_ENABLE_SEMANTIC").exists(v =>
      Set("1", "true", "yes", "on").contains(v.toLowerCase)),
    embeddingModel = env.getOrElse("FRONTMATTER_EMBEDDING_MODEL", DefaultEmbeddingModel),
    cacheDirRaw = env.get("FRONTMATTER_CACHE_DIR"))
}
