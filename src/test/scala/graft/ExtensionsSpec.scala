package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.GraftExtensions` must install the full
  * expression-backed SQL surface at session build time, with no Scala
  * registration call — the cluster-deployment path.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions session exposes every injected function via pure SQL") {
    val base = TestSpark.spark // guarantees a live SparkContext to attach to
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s =
      try SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      finally {
        SparkSession.setDefaultSession(base)
        SparkSession.setActiveSession(base)
      }
    assert(s ne base, "builder must create a fresh session, not reuse the base one")

    val scalarRow = s.sql(
      """SELECT array_cosine_similarity(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
        |                               array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS cs,
        |       array_cosine_distance(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
        |                             array(CAST(0 AS FLOAT), CAST(1 AS FLOAT))) AS cd,
        |       list_cosine_similarity(array(CAST(3 AS FLOAT)), array(CAST(7 AS FLOAT))) AS lcs,
        |       list_cosine_distance(array(CAST(3 AS FLOAT)), array(CAST(7 AS FLOAT))) AS lcd,
        |       list_contains(array('a','b'), 'b') AS lc,
        |       string_split('a,b,c', ',') AS sp,
        |       len('abcd') AS l,
        |       regexp_matches('abc', 'b+') AS rm
        |""".stripMargin).head()
    withClue(s"row=$scalarRow:") {
      assert(math.abs(scalarRow.getAs[Double]("cs") - 1.0) < 1e-9)
      assert(math.abs(scalarRow.getAs[Double]("cd") - 1.0) < 1e-9)
      assert(math.abs(scalarRow.getAs[Double]("lcs") - 1.0) < 1e-9)
      assert(math.abs(scalarRow.getAs[Double]("lcd")) < 1e-9)
      assert(scalarRow.getAs[Boolean]("lc"))
      assert(scalarRow.getAs[scala.collection.Seq[String]]("sp").toList == List("a", "b", "c"))
      assert(scalarRow.getAs[Int]("l") == 4)
      assert(scalarRow.getAs[Boolean]("rm"))
    }

    val aggRow = s.sql(
      """SELECT graft_top_k(struct(x AS s, x AS v), 2) AS top,
        |       graft_kmv(CAST(x * 1000000 AS BIGINT), 2) AS kmv
        |FROM VALUES (5), (1), (9), (3) AS t(x)
        |""".stripMargin).head()
    val top = aggRow.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("top")
      .map(_.getInt(0)).toList
    assert(top == List(1, 3), s"top-2 by struct order, got $top")
    // 4 inserts, k=2 buffer: estimator path, deterministic.
    assert(aggRow.getAs[Double]("kmv") > 0.0)
  }

  test("injected catalog matches the Scala-side session registration") {
    val injected = GraftExtensions.functions.map(_._1.funcName).toSet
    val expected = Set(
      "array_cosine_similarity", "array_cosine_distance",
      "list_cosine_similarity", "list_cosine_distance",
      "list_contains", "string_split", "len", "regexp_matches",
      "graft_top_k", "graft_kmv")
    assert(injected == expected)

    // Each injected name must behave the same as after
    // registerSessionFunctions on a plain session (the existing seam).
    val plain = TestSpark.spark
    SparkEntry.registerSessionFunctions(plain)
    injected.foreach { name =>
      assert(plain.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name missing from registerSessionFunctions surface")
    }
  }
}
