package graft

import org.apache.spark.sql.SparkSession

import graft.fixtures.FixtureCorpus
import graft.fm.{QueryEngine, Settings}

/** Dev loop dialect prober: run one SQL statement through the full
  * engine path (dialect rewrite + private session) over the fixture
  * corpus, print the result — and, with `--raw`, ALSO through plain
  * `spark.sql` to separate a rewrite gap from a Spark-capability gap.
  *
  * Usage: runMain graft.SqlProbe [--raw] <sql> [sfDir]
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val (raw, rest) = args.partition(_ == "--raw")
    val sql = rest(0)
    val sfDir = if (rest.length > 1) rest(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-sql-probe").getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_PROBE_LOG", "ERROR"))
    SparkEntry.registerSessionFunctions(spark)
    if (raw.nonEmpty) {
      println("=== raw spark.sql ===")
      try spark.sql(sql).show(50, truncate = false)
      catch { case e: Throwable => println(s"RAW FAIL: ${e.getMessage}") }
    }
    println("=== engine path ===")
    val base = FixtureCorpus.ensure(spark, sfDir)
    val engine = new QueryEngine(
      spark, Settings(base.toString, enableSemantic = false, "", None))
    try {
      val r = engine.query("**/*.md", sql)
      r.results.show(50, truncate = false)
    } catch {
      case e: Throwable =>
        println(s"ENGINE FAIL: ${e.getMessage}")
        if (sys.env.contains("SPARK_GRAFT_PROBE_STACK")) e.printStackTrace()
    }
    spark.stop()
  }
}
