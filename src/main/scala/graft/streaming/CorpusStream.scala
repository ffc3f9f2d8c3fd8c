package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fm.Frontmatter
import graft.semantic.Embed

/** Streaming corpus ingestion: the Structured-Streaming re-expression of
  * the reference's mtime-differential reindex loop
  * (`semantic/indexer.py:97-132`) — the file source tracks processed
  * files, so each micro-batch parses and embeds only NEW documents, the
  * same incremental contract the batch indexer gets from mtime diffing.
  * Sink-side, the embedding snapshot becomes an append stream instead of
  * a rewritten parquet.
  */
object CorpusStream {

  /** One row per newly-arrived markdown file: (path, body, embedding).
    * Works on any file-source-compatible store; `wholetext` keeps file
    * boundaries.
    */
  def embeddingStream(
      spark: SparkSession,
      baseDir: String,
      glob: String = "*.md",
      dim: Int = Embed.DefaultDim): DataFrame = {
    import spark.implicits._
    spark.readStream
      .format("text")
      .option("wholetext", "true")
      .load(s"$baseDir/$glob")
      .select(input_file_name().as("path"), col("value"))
      .as[(String, String)]
      .map { case (path, text) =>
        val post = Frontmatter.parse(text)
        val body = post.content.strip()
        (path, body, if (body.isEmpty) null else Embed.encode(body, dim))
      }
      .toDF("path", "body", "embedding")
  }
}
