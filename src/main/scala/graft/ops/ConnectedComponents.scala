package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Min-label propagation connected components over an undirected edge
  * list — the clustering step a dedup pipeline runs after candidate-pair
  * scoring (each near-dup cluster keeps one canonical document).
  *
  * Each iteration is a shuffle-bounded join (labels ⋈ edges → min per
  * node); iterations needed = graph diameter, which for near-dup
  * clusters is tiny. Deterministic: labels are min doc ids, so the
  * result is independent of partitioning — which is also what lets a
  * recursive-CTE oracle reproduce it exactly.
  */
object ConnectedComponents {

  /** @param edges two long columns (a, b), undirected.
    * @return (node, label) for every node appearing in `edges`, where
    *         label = min node id reachable from it.
    */
  /** Eagerly materialize `df` as an RDD-backed frame with its lineage cut
    * off, returning the RDD handle so the caller can free the blocks
    * deterministically once the frame is superseded. Truncation, not just
    * caching, is the point: iterative plans otherwise nest the
    * (potentially huge) edge-producing lineage one level deeper per
    * round, and driver-side analysis of the growing tree quickly
    * dominates the actual sub-second execution. On a cluster, swap the
    * local checkpoint for a reliable one (HDFS-backed) if executor loss
    * mid-iteration must be survivable.
    */
  private def truncate(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val rdd = df.rdd.localCheckpoint()
    rdd.count() // eager
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  def labelPropagate(spark: SparkSession, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val (sym, symRdd) = truncate(edges.toDF("a", "b")
      .union(edges.toDF("b", "a").select(col("a"), col("b")))
      .distinct())
    var (labels, labelsRdd) = truncate(sym.select(col("a").as("node"))
      .union(sym.select(col("b").as("node")))
      .distinct()
      .withColumn("label", col("node")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate label for each node: min of its own, its neighbors',
      // and its label's label (pointer jumping — label chains halve each
      // round, so iterations ~ log(diameter) instead of diameter)
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .select(col("a").as("node"), col("label"))
      val viaLabel = labels
        .join(labels.select(col("node").as("label"), col("label").as("label2")), Seq("label"))
        .select(col("node"), col("label2").as("label"))
      val (next, nextRdd) = truncate(
        labels.select("node", "label").union(viaNeighbors).union(viaLabel)
          .groupBy("node").agg(min("label").as("label")))
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("node"))
        .filter(col("label") =!= col("old"))
        .limit(1).count()
      labelsRdd.unpersist(blocking = false) // superseded generation's blocks
      labels = next
      labelsRdd = nextRdd
      converged = changed == 0
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG")) println(s"[cc] iter=$iter changed=$changed")
    }
    symRdd.unpersist(blocking = false)
    labels
  }
}
