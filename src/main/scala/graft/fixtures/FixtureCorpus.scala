package graft.fixtures

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Deterministic Markdown corpus derived from the driver's
  * `documents.parquet`, so frontmatter-engine queries can be checked
  * against a DuckDB oracle that reconstructs the same `files` table
  * directly from `documents` (see [[oracle.filesCte]]).
  *
  * Per document `doc_id`:
  *  - path `{source}/doc_{doc_id%05d}.md`;
  *  - `doc_id % 100 == 7` → NO frontmatter (exercises the empty-metadata
  *    path: record has only `path`, every other column NULL);
  *  - else frontmatter: `id` int, `lang`, `source` strings, `n_chars` int,
  *    `created` date (2025-01-01 + doc_id % 365 days), `tags` = first 3
  *    words of text (list), `published` bool (doc_id even), `score` float
  *    n_chars/10.0 (omitted when doc_id % 5 == 0 → nullable), `category`
  *    ("cat" + doc_id%7, present only when doc_id % 3 == 0 → nullable);
  *  - body = text.
  */
object FixtureCorpus {

  /** Bump when generation rules change: the version is part of the corpus
    * directory name, so stale corpora from older code are never reused.
    */
  private val Version = "v3"

  def ensure(spark: SparkSession, sfDir: String): Path = synchronized {
    val slug = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val dest = Paths.get(s"/tmp/graft_fm_corpus_${Version}_$slug")
    val marker = dest.resolve(".complete")
    if (Files.exists(marker)) return dest
    val rows = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
    rows.foreach { r =>
      val docId = r.getLong(0)
      val text = r.getString(1)
      val lang = r.getString(2)
      val source = r.getString(3)
      val nChars = r.getLong(4)
      val rel = f"$source/doc_$docId%05d.md"
      val out = dest.resolve(rel)
      Files.createDirectories(out.getParent)
      Files.write(out, render(docId, text, lang, source, nChars).getBytes("UTF-8"))
    }
    writeDataExports(spark, sfDir, dest)
    Files.write(marker, Version.getBytes("UTF-8"))
    dest
  }

  /** Sidecar data files under `data/` for the file-reading table
    * functions (q_fm_read_*): the same (doc_id, lang, n_chars)
    * projection of `documents` as CSV, NDJSON, and a single parquet
    * file, doc_id-sorted, so the DuckDB oracle can reproduce every
    * query directly from the `documents` view.
    */
  private def writeDataExports(
      spark: SparkSession, sfDir: String, dest: Path): Unit = {
    val dataDir = dest.resolve("data")
    Files.createDirectories(dataDir)
    val rows = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars")
      .collect()
      .sortBy(_.getLong(0))
    val csv = new StringBuilder("doc_id,lang,n_chars\n")
    rows.foreach(r => csv ++= s"${r.getLong(0)},${r.getString(1)},${r.getLong(2)}\n")
    Files.write(dataDir.resolve("export.csv"), csv.toString.getBytes("UTF-8"))
    val json = new StringBuilder
    rows.foreach(r => json ++=
      s"""{"doc_id":${r.getLong(0)},"lang":"${r.getString(1)}","n_chars":${r.getLong(2)}}\n""")
    Files.write(dataDir.resolve("export.json"), json.toString.getBytes("UTF-8"))
    val tmp = Files.createTempDirectory("graft_fixture_pq")
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("no parquet part written"))
    Files.move(part, dataDir.resolve("export.parquet"))
  }

  private[fixtures] def render(
      docId: Long, text: String, lang: String, source: String, nChars: Long): String = {
    if (docId % 100 == 7) return text + "\n"
    val created = java.time.LocalDate.of(2025, 1, 1).plusDays(docId % 365)
    val tags = text.split(" ").take(3)
    val sb = new StringBuilder("---\n")
    sb ++= s"id: $docId\n"
    sb ++= s"lang: $lang\n"
    sb ++= s"source: $source\n"
    sb ++= s"n_chars: $nChars\n"
    sb ++= s"created: $created\n"
    sb ++= "tags:\n"
    tags.foreach(t => sb ++= s"- $t\n")
    sb ++= s"published: ${if (docId % 2 == 0) "true" else "false"}\n"
    if (docId % 5 != 0) sb ++= s"score: ${nChars / 10.0}\n"
    if (docId % 3 == 0) sb ++= s"category: cat${docId % 7}\n"
    sb ++= "---\n\n"
    sb ++= text
    sb ++= "\n"
    sb.toString
  }

  /** DuckDB CTE reconstructing the exact `files` table the engine derives
    * from this corpus — shared prefix of every q_fm_* oracle.
    */
  val filesCte: String =
    """WITH files AS (
      |  SELECT
      |    source || '/doc_' || lpad(CAST(doc_id AS VARCHAR), 5, '0') || '.md' AS path,
      |    CASE WHEN doc_id % 100 = 7 THEN NULL ELSE CAST(doc_id AS VARCHAR) END AS id,
      |    CASE WHEN doc_id % 100 = 7 THEN NULL ELSE lang END AS lang,
      |    CASE WHEN doc_id % 100 = 7 THEN NULL ELSE source END AS source,
      |    CASE WHEN doc_id % 100 = 7 THEN NULL ELSE CAST(n_chars AS VARCHAR) END AS n_chars,
      |    CASE WHEN doc_id % 100 = 7 THEN NULL
      |         ELSE strftime(DATE '2025-01-01' + CAST(doc_id % 365 AS INT), '%Y-%m-%d') END AS created,
      |    CASE WHEN doc_id % 100 = 7 THEN NULL
      |         ELSE '["' || array_to_string(string_split(text, ' ')[1:3], '", "') || '"]' END AS tags,
      |    CASE WHEN doc_id % 100 = 7 THEN NULL
      |         WHEN doc_id % 2 = 0 THEN 'True' ELSE 'False' END AS published,
      |    CASE WHEN doc_id % 100 = 7 OR doc_id % 5 = 0 THEN NULL
      |         ELSE CAST(n_chars / 10.0 AS VARCHAR) END AS score,
      |    CASE WHEN doc_id % 100 = 7 OR doc_id % 3 <> 0 THEN NULL
      |         ELSE 'cat' || CAST(doc_id % 7 AS VARCHAR) END AS category
      |  FROM documents
      |)""".stripMargin
}
