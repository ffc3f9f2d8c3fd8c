package graft.semantic

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fm.{FileScan, SemanticProvider, Settings}

/** Semantic-search context (reference `semantic/context.py`): wires the
  * deterministic encoder, the parquet embedding cache, and the
  * differential indexer, and plugs into [[graft.fm.QueryEngine]] as a
  * [[SemanticProvider]] — when READY, `files` gains an `embedding`
  * column via a left join on `path` and SQL gains `embed()` plus the
  * cosine functions (reference `semantic/query.py:11-65`).
  */
final class SemanticContext(
    spark: SparkSession,
    settings: Settings,
    val dim: Int = Embed.DefaultDim,
    glob: String = "**/*.md") extends SemanticProvider {

  val cache = new EmbeddingCache(spark, settings.cacheDir, settings.embeddingModel, dim)

  val indexer = new EmbeddingIndexer(
    cache,
    text => Embed.encode(text, dim),
    () => FileScan.collect(settings.baseDir, glob).map(settings.baseDir.resolve),
    settings.baseDir)

  override def isReady: Boolean = indexer.state == IndexerState.Ready

  override def withEmbedding(files: DataFrame): DataFrame =
    files.join(cache.asDataFrame, Seq("path"), "left")

  override def registerFunctions(spark: SparkSession): Unit = {
    CosineFunctions.register(spark)
    Embed.register(spark, dim)
  }
}
