package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Distributed ordered prefix sum — the building block for sequence
  * packing (assigning documents to fixed-token-budget training windows),
  * global record offsets, and quota assignment.
  *
  * A naive `Window.orderBy(key)` with no partitioning funnels the ENTIRE
  * dataset through one task — the canonical 100 TB anti-pattern. This is
  * the standard two-pass alternative: range-partition on the key (so
  * partition p holds a contiguous key range), compute per-partition
  * ordered running sums, then add each partition's cumulative offset,
  * which is a prefix sum over only `partitions` rows and is broadcast
  * back. The result is exact and independent of where the range
  * boundaries land.
  */
object PrefixSum {

  /** Appends `cum_before` = sum of `valueCol` over all rows strictly
    * before the current one in `orderCol` order. `orderCol` must be
    * unique (pre-aggregate per key otherwise — ties split across the
    * local windows would make "before" ambiguous).
    */
  def runningBefore(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      partitions: Int): DataFrame = {
    // Materialize the ranged frame ONCE (eager local checkpoint): both
    // passes below must observe the same partition assignment, and range
    // boundaries come from runtime sampling — two independent executions
    // of the exchange could legally pick different boundaries, silently
    // corrupting the offsets. (No pre-sort here: the per-partition window
    // performs its own sort, and the offsets aggregate doesn't care.)
    val ranged = df
      .repartitionByRange(partitions, F.col(orderCol))
      .withColumn("_pid", F.spark_partition_id())
      .localCheckpoint()
    val localWin = Window.partitionBy("_pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsetWin = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    // one row per partition — the single-partition window here is over
    // `partitions` rows, not the data
    val offsets = ranged.groupBy("_pid")
      .agg(F.sum(F.col(valueCol)).as("_ptot"))
      .select(F.col("_pid"), F.coalesce(F.sum("_ptot").over(offsetWin), F.lit(0L)).as("_poff"))
    ranged
      .join(F.broadcast(offsets), Seq("_pid"))
      .withColumn("cum_before",
        F.col("_poff") + F.coalesce(F.sum(F.col(valueCol)).over(localWin), F.lit(0L)))
      .drop("_pid", "_poff")
  }
}
