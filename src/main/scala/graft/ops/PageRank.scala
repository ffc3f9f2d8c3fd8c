package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic integer PageRank over an edge frame.
  *
  * Ranks live on a SCALE = 1e12 integer grid: per-edge contributions
  * are integer divisions (`pr DIV outdeg`), and the damping mix is
  * `(15 * base + 85 * contrib) DIV 100` — every quantity is
  * BIGINT-exact, so distributed summation order cannot change a single
  * rank and a fixed-iteration run is replayable bit-for-bit in SQL
  * (DuckDB `//` = Spark `DIV` on positive integers). The tiny mass
  * leak from floor division is deliberate and identical in both
  * engines.
  *
  * Scale shape: each iteration is one equi-join of the edge frame with
  * the current rank frame (both partitioned by the join key) plus a
  * hash aggregate on `dst` — the standard bulk-iteration shape. The
  * degree-annotated edge frame is persisted once and reused across
  * iterations; rank frames are iteration-local. For deep iteration
  * counts the lineage-truncation pattern of
  * [[graft.ops.ConnectedComponents]] applies; the fixed shallow counts
  * used here (<= 8) do not need it.
  *
  * Callers must feed an edge set where EVERY node has at least one
  * incoming edge (e.g. a symmetrized graph), otherwise in-degree-0
  * nodes drop out of the rank frame after one iteration.
  */
object PageRank {

  /** Rank grid: ranks sum to ~Scale (1.0 == 1e12). */
  val Scale = 1000000000000L

  /** Run `iterations` damped rank updates (d = 0.85) over `(src, dst)`
    * edges; returns `(node, pr)` with `pr` on the integer grid.
    */
  def run(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges.select("src", "dst")
    val withDeg = e.join(
        e.groupBy("src").agg(count(lit(1)).as("outdeg")).hint("shuffle_hash"),
        Seq("src"))
      .persist()
    val nc = broadcast(
      e.select(col("src").as("node")).distinct().agg(count(lit(1)).as("n")))
    val baseExpr = s"CAST($Scale AS BIGINT) DIV n"
    var ranks = e.select(col("src").as("node")).distinct()
      .crossJoin(nc)
      .select(col("node"), expr(baseExpr).as("pr"))
    (1 to iterations).foreach { _ =>
      // Build the hash table on the node-sized rank frame: a sort-merge
      // join would sort the (much larger) edge frame every iteration,
      // and at graph scale neither side broadcasts.
      ranks = withDeg
        .join(ranks.hint("shuffle_hash"), withDeg("src") === ranks("node"))
        .select(col("dst"), expr("pr DIV outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("contrib"))
        .crossJoin(nc)
        .select(col("dst").as("node"),
          expr(s"(15 * ($baseExpr) + 85 * contrib) DIV 100").as("pr"))
    }
    ranks
  }
}
