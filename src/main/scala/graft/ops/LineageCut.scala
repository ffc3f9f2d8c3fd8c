package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared lineage-truncation discipline for iterative DataFrame loops
  * (k-core peeling, PageRank, pointer-jumping CC): without a cut every
  * few rounds, a loop body that references its input k times hands
  * Catalyst a k^rounds-copy logical tree — analysis time explodes long
  * before execution does.
  *
  * Dataset.localCheckpoint(eager) is the cut: it materializes the plan
  * ONCE at the InternalRow level and re-roots the frame on the cached
  * RDD (the old `.rdd` + `createDataFrame` round-trip paid an extra
  * physical planning AND a Row deserialize/re-serialize on every
  * downstream read). What localCheckpoint does not do is free the
  * PREVIOUS generation's blocks, so a long loop leaks every superseded
  * checkpoint; this tracker unpersists them as they are replaced.
  *
  * Generation tracking snapshots `getPersistentRDDs` around the
  * checkpoint call — use one tracker per single-threaded loop (a
  * concurrent persist between the two snapshots could be adopted and
  * later freed; bench/verify loops are sequential by construction).
  */
final class LineageCut {
  private var prev: Seq[org.apache.spark.rdd.RDD[_]] = Nil

  /** Materialize `df`, free the previous generation, return the
    * re-rooted frame.
    */
  def cut(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint(eager = true)
    val added = sc.getPersistentRDDs
      .collect { case (id, rdd) if !before.contains(id) => rdd }.toSeq
    release()
    prev = added
    out
  }

  /** Free the last generation (call after the loop's final consumer is
    * itself materialized, or let the final blocks live if the result
    * frame is returned to a caller).
    */
  def release(): Unit = {
    prev.foreach(_.unpersist(blocking = false))
    prev = Nil
  }
}
