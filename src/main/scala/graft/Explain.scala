package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the formatted executed plan (post-AQE
  * where enabled) plus the operator counts PLANS.md entries cite.
  *
  * Usage: runMain graft.Explain <query_name>[,<query_name>…] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.registerSessionFunctions(spark)
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // force execution so adaptive plans finalize
      df.queryExecution.toRdd.foreach(_ => ())
      val p = df.queryExecution.executedPlan.toString
      def n(s: String): Int = {
        var c = 0; var i = p.indexOf(s)
        while (i >= 0) { c += 1; i = p.indexOf(s, i + 1) }
        c
      }
      println(s"==== $name ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      println(s"[counts] exchanges=${n("Exchange")} window=${n("Window")} " +
        s"sort=${n("Sort")} bhj=${n("BroadcastHashJoin")} " +
        s"smj=${n("SortMergeJoin")} shj=${n("ShuffledHashJoin")} " +
        s"codegen_spans=${math.max(n("WholeStageCodegen"), n("*("))}")
    }
    spark.stop()
  }
}
