package graft.fm

import java.nio.file.{Files, Paths}
import java.{util => ju}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** One serialized frontmatter field of one file. */
final case class ParsedField(key: String, value: String, isArray: Boolean)

/** One parsed file: ok + fields, or a warning (reference `files.py:70-107`
  * collects per-file failures as warnings, not errors).
  */
final case class ParsedFile(path: String, ok: Boolean, error: String, fields: Seq[ParsedField])

final case class ParseWarning(path: String, error: String)

/** Distributed ingest: relative paths → parsed+serialized records →
  * union-of-keys all-strings `files` DataFrame (reference
  * `query.py:23-59`). The reference collects every record on one node;
  * here parsing/serialization runs in executors and only the distinct key
  * set (bounded by the number of distinct frontmatter properties) and the
  * warning list are collected — the two-pass shape that stays viable at
  * 100 TB (SURVEY.md §7.4).
  */
object Corpus {

  /** Record fields for one document: synthetic `path` first, then YAML
    * metadata in document order; a frontmatter key literally named "path"
    * overrides the synthetic value (reference `files.py:62-67` dict
    * update semantics).
    */
  def recordFields(relPath: String, text: String): Seq[ParsedField] = {
    val post = Frontmatter.parse(text)
    val lm = new ju.LinkedHashMap[String, Any]()
    lm.put("path", relPath)
    post.metadata.forEach((k, v) => lm.put(k, v))
    lm.entrySet().asScala.toSeq.map { e =>
      ParsedField(e.getKey, PyValue.serialize(e.getValue), e.getValue.isInstanceOf[ju.List[_]])
    }
  }

  /** Parse `relPaths` under `baseDir` in executors. */
  def parse(spark: SparkSession, baseDir: String, relPaths: Seq[String]): Dataset[ParsedFile] = {
    import spark.implicits._
    val bd = baseDir
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism, relPaths.size / 32 + 1))
    spark.createDataset(relPaths).repartition(parts).mapPartitions { it =>
      it.map { rel =>
        try {
          val bytes = Files.readAllBytes(Paths.get(bd).resolve(rel))
          ParsedFile(rel, ok = true, null, recordFields(rel, new String(bytes, "UTF-8")))
        } catch {
          case e: Exception =>
            ParsedFile(rel, ok = false, s"${e.getClass.getSimpleName}: ${e.getMessage}", Nil)
        }
      }
    }
  }

  /** Union-of-keys all-strings DataFrame + parse warnings.
    * Column order: `path` first, then sorted keys (deterministic; the
    * reference's set-iteration order is arbitrary).
    */
  def filesDF(spark: SparkSession, parsed: Dataset[ParsedFile],
      maxWarnings: Int = Settings.maxListed()): (DataFrame, Seq[ParseWarning]) = {
    import spark.implicits._
    val good = parsed.filter(_.ok)
    val keys = good.flatMap(_.fields.map(_.key)).distinct().collect().sorted
    val ordered = "path" +: keys.filterNot(_ == "path").toSeq
    val schema = StructType(ordered.map(k => StructField(k, StringType, nullable = k != "path")))
    val rows = good.rdd.map { pf =>
      val m = pf.fields.iterator.map(f => f.key -> f.value).toMap
      Row.fromSeq(ordered.map(m.getOrElse(_, null)))
    }
    // r17, measured and REVERTED: an experiment coalesced the cached
    // serving frame to ~200k rows per partition on the theory that the
    // parse layout (32 slivers at sf0.1) taxed every downstream
    // exchange with 32×N shuffle block files. The quiet-box record
    // falsified it: the shuffle-file cost is negligible at this width,
    // while expression-heavy rows lost their scan parallelism — the 66
    // fm rows without their own r17 fixes regressed +2.4 s in
    // aggregate, led by q_fm_json_ops 0.20→0.48 s and q_fm_listfns
    // 0.16→0.36 s (run spreads ≤ 0.03, i.e. real). The parse layout
    // (Corpus.parse: ≥32 files per task, capped at defaultParallelism)
    // is already the right serving layout at every scale probed.
    // Warning list bounded at the driver (Settings.maxListed): the full
    // list is reference parity and kept verbatim below the cap, but a
    // corpus with 10⁹ unparseable files must not OOM the driver building
    // it — above the cap the first N are listed plus one summary entry
    // carrying the exact remainder count.
    val cap = math.max(1, maxWarnings)
    val bad = parsed.filter(!_.ok)
    val head = bad.take(cap + 1)
    val warnings =
      if (head.length <= cap) head.map(p => ParseWarning(p.path, p.error)).toSeq
      else {
        val total = bad.count()
        head.take(cap).map(p => ParseWarning(p.path, p.error)).toSeq :+
          ParseWarning("(truncated)",
            s"... ${total - cap} more parse warnings not listed (listing capped at $cap; set FRONTMATTER_MAX_LIST to raise)")
      }
    (spark.createDataFrame(rows, schema), warnings)
  }

  /** Corpus fingerprint over (relPath, mtime): the Spark-shaped analogue of
    * the reference's per-file mtime cache (`files.py:19-49`) — when
    * unchanged, a cached parsed DataFrame is reused (see [[QueryEngine]]).
    */
  def fingerprint(pathsWithMtime: Seq[(String, Long)]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    pathsWithMtime.foreach { case (p, m) =>
      md.update(p.getBytes("UTF-8")); md.update(m.toString.getBytes("UTF-8")); md.update(0.toByte)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Driver-side parse with the reference's per-file mtime cache — the
    * exact `parse_files` semantics (`files.py:70-107`) as an API-parity
    * path for embedders that want the reference's driver-local shape.
    * The query engine uses the distributed [[parse]] + fingerprint cache
    * instead, and the mutation tools read files directly (as the
    * reference's own update path does).
    */
  def parseFilesLocal(
      paths: Seq[java.nio.file.Path],
      baseDir: java.nio.file.Path,
      cache: FileRecordCache): (Seq[Map[String, Any]], Seq[ParseWarning]) = {
    val records = Seq.newBuilder[Map[String, Any]]
    val warnings = Seq.newBuilder[ParseWarning]
    paths.foreach { p =>
      cache.get(p, baseDir) match {
        case Some(rec) => records += rec
        case None =>
          try {
            val post = Frontmatter.load(p)
            val rec = (scala.collection.immutable.ListMap("path" -> (baseDir.relativize(p).toString: Any))
              ++ post.metadata.asScala.toSeq)
            records += rec
            cache.set(p, baseDir, rec)
          } catch {
            case e: Exception =>
              warnings += ParseWarning(baseDir.relativize(p).toString, String.valueOf(e.getMessage))
          }
      }
    }
    (records.result(), warnings.result())
  }
}
