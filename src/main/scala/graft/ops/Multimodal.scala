package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat media as opaque `binary` columns with
  * typed metadata, and run decode / feature-extraction as BATCHED
  * per-partition functions — the Spark-side shape (schema, partitioning,
  * batch iteration) is real; the decode kernel itself is a clearly-marked
  * deterministic STUB because no image/audio codecs ship in this
  * environment. Swapping in a real decoder changes only
  * [[Multimodal.decodeBatch]].
  */
object Multimodal {

  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, first_byte: Int,
      width: Int, height: Int, format: String)

  /** STUB decode kernel: derives deterministic pseudo-metadata from the
    * raw bytes only (what a real codec would parse from headers). A real
    * implementation would decode the payload here, one batch at a time.
    */
  def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, bytes) =>
      val nb = bytes.length
      MediaFeatures(
        doc_id = id,
        n_bytes = nb,
        first_byte = if (nb > 0) bytes(0) & 0xff else -1,
        width = 64 + nb % 577,
        height = 64 + (nb * 31) % 433,
        format = (nb % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" })
    }

  /** documents → binary payload column → batched per-partition decode.
    * Batches of `batchSize` bound peak memory per task the way a real
    * vectorized decoder (or Arrow batch) would.
    */
  def decodeFeatures(spark: SparkSession, docs: DataFrame, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val payload = docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    payload
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
      .toDF()
  }
}
