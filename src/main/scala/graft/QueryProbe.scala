package graft

import org.apache.spark.sql.SparkSession

/** Dev loop profiler: time one catalog query N times against a warm
  * session and print its formatted physical plan — the fast way to tell
  * a plan problem from scheduler jitter without a full bench run.
  *
  * Usage: runMain graft.QueryProbe <queryName> [sfDir] [runs]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "9")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // mirror Bench's AQE setting (r17): probing with AQE on measured
      // its per-stage materialization barriers, not the query
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .appName("graft-probe").getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_PROBE_LOG", "WARN"))
    SparkEntry.registerSessionFunctions(spark)
    Tables.warm(spark, sfDir)
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm-up
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[probe] run$i%d build ${(t1 - t0) / 1e9}%.3f s " +
        f"exec ${(t2 - t1) / 1e9}%.3f s")
    }
    println(fn(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
