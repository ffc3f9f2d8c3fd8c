package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed training of a linear classifier with a hard-sigmoid
  * link, on an EXACT integer grid — the weak-label quality-classifier
  * pattern (fastText/DCLM-style: bootstrap labels from a heuristic,
  * fit a linear model, score the whole corpus with it).
  *
  * Why integer arithmetic: the trained weights must be bit-identical
  * across engines (the oracle gate replays the same unrolled recursion
  * in DuckDB), and float gradient sums are order-dependent under
  * distributed reduction. Every quantity here lives on a fixed grid —
  * features as milli-z-scores, probabilities in permille, weights in
  * micro-units — and every division is truncating BIGINT division
  * (Spark `div` == DuckDB `//` == Scala `/`, all toward zero), so the
  * result is independent of partitioning and reduction order.
  *
  * Link function: p_permille = clamp(500 + (w·x / 10^6) / 4, 0, 1000)
  * — the hard sigmoid (piecewise-linear logistic). Exactly computable
  * on the grid, same gradient-descent fixed points as the smooth
  * version for separable data.
  *
  * Scale shape: the feature frame is scanned once per iteration with a
  * single 5-value aggregate (partial map-side combine, one scalar row
  * to the driver); the driver holds ONLY the weight vector (model
  * state, KB-sized — the same justified-collect class as k-means
  * centroids). No per-row state ever returns to the driver.
  *
  * Overflow envelope: each gradient term |(y1000 - p) * x_j| <= 1000 *
  * |x_j|; with milli-z-scored features |x_j| stays under ~10^6 even for
  * a degenerate stddev-1 feature, so the BIGINT sum is safe to ~10^10
  * rows per partition-tree. Beyond that, aggregate per-shard averages
  * first (same grid, one extra truncation) or lift the sum to
  * DECIMAL(38,0) — the update rule is unchanged.
  */
object LinearClassifier {

  /** One gradient-descent step's update, shared by train() and by spec
    * replays: w_j + (lrNum * (gradSum_j / n)) / lrDen, all truncating.
    */
  def step(w: Long, gradSum: Long, n: Long, lrNum: Long, lrDen: Long): Long =
    w + (lrNum * (gradSum / n)) / lrDen

  /** The permille hard-sigmoid prediction expression over feature
    * columns, for a concrete weight vector. `featCols` must align with
    * `w`.
    */
  def predictExpr(featCols: Seq[String], w: Seq[Long]): String = {
    val dot = featCols.zip(w).map { case (c, wj) => s"${wj}L * $c" }
      .mkString(" + ")
    s"GREATEST(0L, LEAST(1000L, 500 + (($dot) div 1000000) div 4))"
  }

  /** Train on rows where `trainCol` is true (the whole frame scores in
    * [[predictExpr]] afterward — holdout rows never contribute
    * gradient). Returns the weight vector after `iters` full-batch
    * steps from all-zero weights.
    *
    * `feats` should be persisted by the caller: every iteration scans
    * it once.
    */
  def train(
      feats: DataFrame,
      featCols: Seq[String],
      labelCol: String,
      trainCol: String,
      iters: Int,
      lrNum: Long,
      lrDen: Long): Array[Long] = {
    val w = Array.fill(featCols.length)(0L)
    var it = 0
    while (it < iters) {
      val p = predictExpr(featCols, w.toSeq)
      val gradCols = featCols.zipWithIndex.map { case (c, j) =>
        expr(s"SUM(CASE WHEN $trainCol THEN ($labelCol - ($p)) * $c END)")
          .cast("long").as(s"g$j")
      } :+ expr(s"COUNT(CASE WHEN $trainCol THEN 1 END)")
        .cast("long").as("n")
      val row = feats.agg(gradCols.head, gradCols.tail: _*).collect()(0)
      val n = row.getAs[Long]("n")
      require(n > 0, "no training rows (trainCol never true)")
      var j = 0
      while (j < w.length) {
        w(j) = step(w(j), row.getAs[Long](s"g$j"), n, lrNum, lrDen)
        j += 1
      }
      it += 1
    }
    w
  }
}
