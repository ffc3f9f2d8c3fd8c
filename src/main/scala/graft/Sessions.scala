package graft

import org.apache.spark.sql.SparkSession

/** Session profiles encoding how this library expects to be deployed —
  * the scale configuration as code rather than tribal knowledge. The
  * query catalog itself never assumes a profile (every operator is
  * tested under both AQE settings: Verify runs adaptive, Bench runs
  * static), but a user standing up the engine should start from these.
  */
object Sessions {

  /** Cluster profile: what a 1000-executor deployment over ~100 TB
    * should run with.
    *
    *  - AQE ON with skew-join splitting and partition coalescing: at
    *    real scale, runtime statistics beat any static
    *    `shuffle.partitions` guess, oversized skewed partitions split
    *    instead of straggling, and kilobyte post-filter partitions
    *    coalesce instead of paying per-task overhead.
    *  - `advisoryPartitionSizeInBytes` 128m: the shuffle sizing target
    *    AQE coalesces/splits toward — matches the parquet row-group
    *    scale the scans produce.
    *  - `files.maxPartitionBytes` 256m: scan splits sized so a task's
    *    working set fits executor memory alongside shuffle buffers.
    *  - UTC session timezone: the engine's exactness envelope (all
    *    temporal oracles are pinned under UTC).
    *
    * Broadcast threshold stays at Spark's default 10 MB — deliberately
    * ABSENT here: the catalog's broadcast sides (codebooks, eval
    * splits, statistics rows, bounded top-K sets) are bounded by
    * construction far below it, and raising it globally risks
    * broadcasting a "dimension" that is data-sized in someone's
    * deployment.
    */
  val ClusterConf: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128m",
    "spark.sql.files.maxPartitionBytes" -> "256m")

  /** Local profile: the interactive / test shape this repo runs under —
    * core-count parallelism, shuffle partitions at the core count (the
    * data at local scale never needs more), UTC for the oracles.
    */
  def localConf(cores: Int): Map[String, String] = Map(
    "spark.sql.shuffle.partitions" -> cores.toString,
    "spark.sql.session.timeZone" -> "UTC",
    "spark.ui.enabled" -> "false")

  def clusterBuilder(appName: String): SparkSession.Builder =
    ClusterConf.foldLeft(SparkSession.builder().appName(appName)) {
      case (b, (k, v)) => b.config(k, v)
    }

  def localBuilder(appName: String, cores: Int): SparkSession.Builder =
    localConf(cores).foldLeft(
      SparkSession.builder().appName(appName).master(s"local[$cores]")) {
      case (b, (k, v)) => b.config(k, v)
    }
}
