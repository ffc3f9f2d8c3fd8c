package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator:
  * keep the k smallest DISTINCT hash values; estimate
  * `(k-1) / r_k` where `r_k` is the kth smallest hash normalized to
  * [0, 1). With fewer than k distinct hashes the buffer IS the exact
  * distinct set.
  *
  * Unlike HLL, KMV with a portable hash is fully deterministic, so the
  * estimate is exactly reproducible in SQL — the oracle recomputes the
  * same kth-order statistic. The bounded buffer makes it partial-
  * aggregate friendly (map-side combine, no per-group state growth).
  */
final class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Double] {
  require(k > 1)

  override def zero: Seq[Long] = Nil

  override def reduce(b: Seq[Long], h: Long): Seq[Long] =
    if (b.length >= k && h >= b.last) b
    else if (b.contains(h)) b
    else ((b :+ h).sorted).take(k)

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    (x ++ y).distinct.sorted.take(k)

  override def finish(b: Seq[Long]): Double =
    if (b.length < k) b.length.toDouble
    else (k - 1).toDouble * KmvAgg.HashSpace / b.last.toDouble

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvAgg {
  /** Hashes are 60-bit (md5-derived), so the normalized space is 2^60. */
  val HashSpace: Double = math.pow(2.0, 60)
}
