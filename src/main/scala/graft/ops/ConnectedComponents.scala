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
  def labelPropagate(spark: SparkSession, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.toDF("a", "b")
      .union(edges.toDF("b", "a").select(col("a"), col("b")))
      .distinct()
      .persist()
    var labels = sym.select(col("a").as("node"))
      .union(sym.select(col("b").as("node")))
      .distinct()
      .withColumn("label", col("node"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate label for each node: min of its own and its neighbors'
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .select(col("a").as("node"), col("label"))
      val next = labels.select("node", "label").union(viaNeighbors)
        .groupBy("node").agg(min("label").as("label"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("node"))
        .filter(col("label") =!= col("old"))
        .limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
