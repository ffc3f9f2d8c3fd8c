package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Scale-safe top-k-per-group: a typed [[Aggregator]] whose buffer holds at
  * most k elements, so Catalyst runs it as partial (map-side) + final
  * aggregation — no per-group sort, no low-cardinality window partition.
  * This replaces the `Window.partitionBy(lowCardKey)` + `row_number`
  * pattern, which at 100 TB funnels every row into one task per distinct
  * key value and sorts whole partitions.
  */
final class TopKAgg[A](k: Int)(implicit ord: Ordering[A], enc: Encoder[Seq[A]])
    extends Aggregator[A, Seq[A], Seq[A]] {
  require(k > 0)
  override def zero: Seq[A] = Nil
  override def reduce(b: Seq[A], a: A): Seq[A] = {
    // Avoid the sort when the incoming element can't displace anything.
    if (b.length >= k && ord.gteq(a, b.last)) b
    else (b :+ a).sorted(ord).take(k)
  }
  override def merge(x: Seq[A], y: Seq[A]): Seq[A] = (x ++ y).sorted(ord).take(k)
  override def finish(b: Seq[A]): Seq[A] = b
  override def bufferEncoder: Encoder[Seq[A]] = enc
  override def outputEncoder: Encoder[Seq[A]] = enc
}
