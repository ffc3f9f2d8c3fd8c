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

  /** Rows of the LARGEST single group of `keys` — the deciding statistic
    * for the hot-key strategy selectors (r17, verdict r16 item 3): the
    * length of the serial chain a per-key ordered operator (window sort,
    * state group, per-key carry) would put through ONE task. The same
    * quantity q_skew_audit reports as its top hitter. One map-side-
    * combining hash aggregate to per-key counts plus a scalar max —
    * bounded (one long) on the driver at any corpus size. Null keys
    * count as their own group, matching window/groupBy semantics.
    */
  def maxGroupRows(df: DataFrame, keys: Seq[Column]): Long = {
    val r = df.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
      .agg(max("__n")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

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
