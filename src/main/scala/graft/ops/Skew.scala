package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation. A groupBy on a skewed
  * key funnels the hot key's rows into one task; salting splits each key
  * into `saltBuckets` sub-groups aggregated in parallel, then a second,
  * tiny aggregation merges the partials. Works for any algebraic
  * aggregate (sum/count/min/max — pass the merge form for phase 2).
  *
  * AQE's skew-join handling covers joins at runtime; this helper is for
  * aggregations, where the partial+final shape must be explicit.
  */
object Skew {

  /** count+sum example shape: returns (key, n, total) computed via a
    * salted first phase. `saltBuckets` should be ~2-4x parallelism for
    * the hot keys; non-hot keys see negligible overhead.
    */
  def saltedCountSum(
      df: DataFrame,
      key: String,
      valueCol: Column,
      saltBuckets: Int): DataFrame = {
    df
      // deterministic salt (hash of full row position-independent inputs
      // would do; pmod of a per-row hash spreads the hot key evenly)
      .withColumn("_salt", pmod(hash(col("*")), lit(saltBuckets)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(valueCol).as("_s"))
      .groupBy(col(key))
      .agg(sum("_n").as("n"), sum("_s").as("total"))
  }
}
