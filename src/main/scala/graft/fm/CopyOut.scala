package graft.fm

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Single-file export for `COPY ... TO` (reference surface: DuckDB
  * writes ONE file at the given path). Spark sinks write a directory of
  * part files, so the export goes to a temp directory next to the
  * target and the single part file is moved into place.
  *
  * Scale note: `coalesce(1)` is deliberate and belongs to the
  * API-result class — a user pointing COPY at one file has asked for a
  * single-file artifact, which is driver-adjacent by construction. Bulk
  * extracts at corpus scale use the shard-planned `partitionBy` sink
  * (q_shard_plan) instead; this path is for query results.
  */
object CopyOut {

  /** Write `df` to `c.path` (resolved inside `baseDir`, same sandbox
    * rule as the mutation tools — escapes throw). Returns the row count
    * (DuckDB's COPY result).
    */
  def writeSingleFile(df: DataFrame, baseDir: Path, c: Dialect.CopyTo): Long = {
    val target = FileScan.resolveForWrite(baseDir, c.path)
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempDirectory(target.getParent, ".graft_copy_")
    // One evaluation: the Count result and the written file must come
    // from the SAME execution (a nondeterministic source — USING SAMPLE
    // — would otherwise report a count from a different sample than the
    // exported rows), and a deterministic source shouldn't compute twice.
    val materialized = df.persist()
    try {
      val rows = materialized.count()
      val out = tmp.resolve("out")
      val w0 = materialized.coalesce(1).write.mode("overwrite")
      (c.format match {
        case "PARQUET" => w0.format("parquet")
        case "CSV" => w0.format("csv").option("header", c.header.toString)
        case "JSON" => w0.format("json")
        case other => throw new IllegalArgumentException(
          s"unsupported COPY format: $other")
      }).save(out.toString)
      val part = listDir(out)
        .find(_.getFileName.toString.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(
          s"no part file produced under $out"))
      Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
      rows
    } finally {
      materialized.unpersist()
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p)) listDir(p).foreach(rm)
        Files.deleteIfExists(p)
      }
      rm(tmp)
    }
  }

  /** Directory listing with the stream CLOSED (Files.list leaks a file
    * descriptor per call otherwise).
    */
  private def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq
    finally s.close()
  }
}
