package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join — for each left row, the latest right row with
  * `right.time <= left.time` in the same key group — an operator Spark
  * lacks natively (SURVEY.md §4 custom-operator tier; DuckDB ships it as
  * ASOF JOIN, which is exactly what the oracle uses).
  *
  * Implemented as the scalable union + ordered-window-carry pattern: tag
  * both sides, union, and carry the last right-side payload forward
  * within each key ordered by (time, right-first, tie). One shuffle on
  * the key, no per-row range probe, no interval explosion — at 100 TB
  * this is a single sort-based exchange partitioned by a high-cardinality
  * key, which beats both a range cross-join and a per-key collect.
  */
object AsOfJoin {

  /** @param carry right-side columns to attach to matching left rows
    *              (packed into one struct internally so they always come
    *              from the SAME right row, even when some are null).
    * @param tie   unique-per-row column present on both sides; breaks
    *              ordering ties deterministically.
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      tie: String,
      carry: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(carry.keys.toSeq.map(col): _*)
    val l2 = left.select(
      col(key), col(time), col(tie), lit(0).as("_side"),
      lit(null).cast(right.select(payload).schema.head.dataType).as("_carry"),
      struct(leftCols.map(col): _*).as("_row"))
    val r2 = right.select(
      col(key), col(time), col(tie), lit(1).as("_side"),
      payload.as("_carry"), lit(null).cast(l2.schema("_row").dataType).as("_row"))
    // right rows sort before left rows at equal time => inclusive (<=)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side").desc, col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l2.union(r2)
      .withColumn("_match", last(col("_carry"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
    val out = leftCols.map(c => col(s"_row.$c").as(c)) ++
      carry.map { case (src, as) => col(s"_match.$src").as(as) }
    carried.select(out: _*)
  }
}
