package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join — pair left rows with right rows whose timestamp
  * falls in `[leftTime + lower, leftTime + upper)` — with NO equi-key.
  * Spark would plan a raw inequality join as a broadcast nested loop (or
  * worse, a cartesian product); this implementation buckets both sides on
  * a time grid sized to the range width, joins on the bucket (an
  * equi-join Catalyst shuffles normally), and filters the exact
  * predicate. Each left row probes at most
  * `ceil(range/bucket) + 1` buckets, so work is linear in rows x a small
  * constant — the standard bucketed range-join used by interval engines.
  */
object RangeJoin {

  /** @param lowerUs inclusive lower offset (microseconds, may be negative)
    * @param upperUs exclusive upper offset
    * Times are `unix_micros`-convertible timestamp columns. Output: all
    * left columns + all right columns (right prefixed with `r_`).
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      lowerUs: Long,
      upperUs: Long): DataFrame = {
    require(upperUs > lowerUs)
    val bucketUs = math.max(1L, upperUs - lowerUs)
    val l = left
      .withColumn("_lt", unix_micros(col(leftTime)))
      .withColumn("_b0", floor((col("_lt") + lit(lowerUs)) / lit(bucketUs)))
      .withColumn("_b1", floor((col("_lt") + lit(upperUs) - 1) / lit(bucketUs)))
      .withColumn("_bucket", explode(sequence(col("_b0"), col("_b1"))))
      .drop("_b0", "_b1")
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
      .withColumn("_rt", unix_micros(col(s"r_$rightTime")))
      .withColumn("_bucket", floor(col("_rt") / lit(bucketUs)))
    l.join(r, Seq("_bucket"))
      .filter(col("_rt") >= col("_lt") + lit(lowerUs) &&
        col("_rt") < col("_lt") + lit(upperUs))
      .drop("_bucket", "_lt", "_rt")
  }
}
