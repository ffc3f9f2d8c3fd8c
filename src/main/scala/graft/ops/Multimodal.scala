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

  final case class ResizedFeatures(
      doc_id: Long, n_bytes: Int, out_len: Int, checksum: Int,
      first_px: Int, last_px: Int)

  /** STUB nearest-neighbor resize kernel: maps the payload onto a fixed
    * `outLen`-byte raster, output position j sampling source byte
    * `(j * nb) / outLen` — the index arithmetic, bounded batching, and
    * schema are the real resize plumbing; a real implementation would
    * run codec + interpolation here. Payloads shorter than the target
    * repeat source bytes (classic nearest-neighbor upscale), longer
    * ones skip (downscale); memory per task is one payload + the fixed
    * output raster.
    */
  def resizeBatch(batch: Seq[(Long, Array[Byte])], outLen: Int): Seq[ResizedFeatures] =
    batch.map { case (id, bytes) =>
      val nb = bytes.length
      if (nb == 0) ResizedFeatures(id, 0, outLen, 0, -1, -1)
      else {
        var s = 0
        var first = -1
        var last = -1
        var j = 0
        while (j < outLen) {
          val b = bytes(((j.toLong * nb) / outLen).toInt) & 0xff
          if (j == 0) first = b
          if (j == outLen - 1) last = b
          s += b
          j += 1
        }
        ResizedFeatures(id, nb, outLen, s, first, last)
      }
    }

  /** documents → payload → batched per-partition resize (same bounded
    * shape as [[decodeFeatures]]).
    */
  def resizeMedia(
      spark: SparkSession, docs: DataFrame,
      outLen: Int = 256, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => resizeBatch(g.toSeq, outLen)))
      .toDF()
  }

  final case class FrameFeatures(
      doc_id: Long, frame_id: Long, off: Long, fr_bytes: Int, checksum: Int)

  /** Frame sampling over an opaque media payload: the payload is a
    * sequence of fixed `frameSize`-byte frames; every `stride`-th frame
    * is sampled and summarized (a video keyframe-sampling stand-in — a
    * real implementation would seek the container's frame index here).
    * Per-frame output stays linear in payload size / stride and each
    * frame touches only its own byte range, so the kernel never
    * materializes more than one frame at a time.
    */
  def frameSampleBatch(
      batch: Seq[(Long, Array[Byte])], frameSize: Int, stride: Int): Seq[FrameFeatures] =
    batch.flatMap { case (id, bytes) =>
      val nf = (bytes.length + frameSize - 1) / frameSize
      (0 until nf by stride).map { i =>
        val off = i * frameSize
        val len = math.min(frameSize, bytes.length - off)
        var s = 0
        var j = 0
        while (j < len) { s += bytes(off + j) & 0xff; j += 1 }
        FrameFeatures(id, i.toLong, off.toLong, len, s)
      }
    }

  /** documents → payload → batched per-partition frame sampling (same
    * bounded-batch shape as [[decodeFeatures]]).
    */
  def sampleFrames(
      spark: SparkSession, docs: DataFrame,
      frameSize: Int = 32, stride: Int = 4, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize)
        .flatMap(g => frameSampleBatch(g.toSeq, frameSize, stride)))
      .toDF()
  }
}
