package graft.fm

import java.nio.file.Path

import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions.{count, lit}

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
    *
    * The count comes from an [[Observation]] on the SAME job that wrote
    * the file — one evaluation by construction, so a nondeterministic
    * source (USING SAMPLE) can never report a count from a different
    * sample than the exported rows, even if a partition were lost and
    * recomputed mid-job the observed metric tracks what was written.
    * All paths go through Hadoop's FileSystem resolved from the
    * target's own URI (explicit `file:` scheme), so a cluster whose
    * default FS is HDFS still writes the sandboxed local target.
    */
  def writeSingleFile(df: DataFrame, baseDir: Path, c: Dialect.CopyTo): Long = {
    val target = FileScan.resolveForWrite(baseDir, c.path)
    val targetPath = new HadoopPath(target.toUri)
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    val fs = targetPath.getFileSystem(hconf)
    fs.mkdirs(targetPath.getParent)
    val tmp = new HadoopPath(targetPath.getParent,
      ".graft_copy_" + java.util.UUID.randomUUID().toString)
    val obs = Observation("graft_copy_" + java.util.UUID.randomUUID().toString)
    try {
      val w0 = df.observe(obs, count(lit(1)).as("rows"))
        .coalesce(1).write.mode("overwrite")
      (c.format match {
        case "PARQUET" => w0.format("parquet")
        case "CSV" => w0.format("csv").option("header", c.header.toString)
        case "JSON" => w0.format("json")
        case other => throw new IllegalArgumentException(
          s"unsupported COPY format: $other")
      }).save(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(_.getName.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(
          s"no part file produced under $tmp"))
      fs.delete(targetPath, false)
      if (!fs.rename(part, targetPath))
        throw new java.io.IOException(s"rename $part -> $targetPath failed")
      obs.get("rows").asInstanceOf[Long]
    } finally {
      fs.delete(tmp, true)
    }
  }
}
