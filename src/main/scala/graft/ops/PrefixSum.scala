package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}
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
    *
    * `partitions` ≤ 0 (the default) scales the range-partition count
    * with the INPUT's scan parallelism instead of a fixed number: scan
    * splits grow linearly with data volume (maxPartitionBytes), so a
    * 600 kB table pays one task and a 100 TB table fans out to
    * thousands, without an extra counting pass to pick the number.
    */
  def runningBefore(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      partitions: Int = -1): DataFrame =
    running(df, orderCol, valueCol, partitions, alsoAfter = false)

  /** [[runningBefore]] plus `cum_after` = sum of `valueCol` over all
    * rows strictly AFTER the current one — both directions from the
    * same ranged frame, same sort, and same offsets aggregate (zero
    * extra passes). A threshold against the grand total then needs no
    * separate counting job: total = cum_before + value + cum_after.
    */
  def runningBeforeAfter(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      partitions: Int = -1): DataFrame =
    running(df, orderCol, valueCol, partitions, alsoAfter = true)

  private def running(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      partitions: Int,
      alsoAfter: Boolean): DataFrame = {
    val parts =
      if (partitions > 0) partitions
      else {
        // Under AQE (the Spark default; Verify runs with it on),
        // Dataset.rdd materializes the adaptive plan — submitting every
        // upstream shuffle stage just to READ a partition count, work
        // the repartitionByRange below then redoes from scratch. The
        // conf's shuffle parallelism is the same order of magnitude and
        // costs nothing; the exact physical count only matters without
        // AQE, where .rdd is a lazy DAG build.
        val conf = df.sparkSession.sessionState.conf
        val n =
          if (conf.adaptiveExecutionEnabled) conf.numShufflePartitions
          else df.rdd.getNumPartitions
        math.min(4096, math.max(1, n))
      }
    // Materialize the ranged frame ONCE (eager local checkpoint): both
    // passes below must observe the same partition assignment, and range
    // boundaries come from runtime sampling — two independent executions
    // of the exchange could legally pick different boundaries, silently
    // corrupting the offsets. (No pre-sort here: the per-partition window
    // performs its own sort, and the offsets aggregate doesn't care.)
    val ranged0 = df
      .repartitionByRange(parts, F.col(orderCol))
      .withColumn("_pid", F.spark_partition_id())
    val localWin = Window.partitionBy("_pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    // Whole-partition total (unbounded frame: computed ONCE per
    // partition, O(n)). The suffix sum derives from it arithmetically —
    // a literal rowsBetween(1, unboundedFollowing) frame would hit
    // Spark's UnboundedFollowingWindowFunctionFrame, which re-evaluates
    // the aggregate from each row to the end: O(n²) per partition.
    val localTotWin = Window.partitionBy("_pid")
    def withLocal(frame: DataFrame, beforeOff: Column, afterOff: Column) = {
      val before = frame.withColumn("cum_before", beforeOff +
        F.coalesce(F.sum(F.col(valueCol)).over(localWin), F.lit(0L)))
      (if (alsoAfter)
        before.withColumn("cum_after", afterOff +
          F.coalesce(F.sum(F.col(valueCol)).over(localTotWin), F.lit(0L)) -
          (F.col("cum_before") - beforeOff) - F.col(valueCol))
      else before).drop("_pid")
    }
    // Single output partition: no sampled boundaries (assignment is
    // trivially deterministic) and the cross-partition offsets are
    // identically zero — one pass, no materialization job, no join.
    if (parts == 1) return withLocal(ranged0, F.lit(0L), F.lit(0L))
    // Materialize the ranged frame ONCE (eager local checkpoint): both
    // passes below must observe the same partition assignment, and range
    // boundaries come from runtime sampling — two independent executions
    // of the exchange could legally pick different boundaries, silently
    // corrupting the offsets. (No pre-sort here: the per-partition window
    // performs its own sort, and the offsets aggregate doesn't care.)
    val ranged = ranged0.localCheckpoint()
    val offsetWin = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsetTotWin = Window.partitionBy(F.lit(1))
    // one row per partition — the single-partition window here is over
    // `partitions` rows, not the data; the suffix offset again derives
    // from the unbounded total (grand − before − own) to stay O(parts).
    val offsets = ranged.groupBy("_pid")
      .agg(F.sum(F.col(valueCol)).as("_ptot"))
      .select(F.col("_pid") +:
        F.coalesce(F.sum("_ptot").over(offsetWin), F.lit(0L)).as("_poff") +:
        (if (alsoAfter)
          Seq((F.coalesce(F.sum("_ptot").over(offsetTotWin), F.lit(0L)) -
            F.coalesce(F.sum("_ptot").over(offsetWin), F.lit(0L)) -
            F.col("_ptot")).as("_paft"))
        else Nil): _*)
    withLocal(
      ranged.join(F.broadcast(offsets), Seq("_pid")),
      F.col("_poff"),
      if (alsoAfter) F.col("_paft") else F.lit(0L))
      .drop("_poff", "_paft")
  }
}
