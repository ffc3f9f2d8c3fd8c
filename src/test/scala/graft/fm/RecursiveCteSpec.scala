package graft.fm

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** UNION-distinct recursive CTEs: Spark runs UNION ALL recursion
  * natively (UnionLoop) but rejects UNION, so the engine executes
  * DuckDB's dedup-until-fixpoint form as a driver-paced distributed
  * loop (QueryEngine.recursiveUnionView). Expected values are DuckDB
  * v1.0.0 output; broad parity is the `recursive` fuzz family.
  */
class RecursiveCteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus(): Path = {
    val dir = Files.createTempDirectory("graft_rec_spec")
    for (i <- 0 until 6)
      Files.write(dir.resolve(s"d$i.md"),
        s"---\nn: $i\n---\nbody $i".getBytes("UTF-8"))
    dir
  }

  private lazy val e = new QueryEngine(
    spark, Settings(corpus().toString, enableSemantic = false, "", None))

  private def rows(sql: String): Seq[Seq[Any]] =
    e.query("**/*.md", sql).results.collect().toSeq.map(_.toSeq)

  test("a cycle terminates at the distinct fixpoint, not the row cap") {
    // (n+1) % 4 from 1 visits {1,2,3,0} then repeats — UNION ALL would
    // run to the recursion limit; UNION stops after one lap
    assert(rows(
      "WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT (n + 1) % 4 FROM t) " +
        "SELECT n FROM t ORDER BY n") == Seq(Seq(0), Seq(1), Seq(2), Seq(3)))
  }

  test("the base term may itself be a UNION; the LAST union splits base from step") {
    // base = {0, 10}; step only fires from 0 (WHERE n < 10) → adds 5
    assert(rows(
      "WITH RECURSIVE t(n) AS (SELECT 0 UNION SELECT 10 UNION SELECT n + 5 FROM t WHERE n < 10) " +
        "SELECT n FROM t ORDER BY n") == Seq(Seq(0), Seq(5), Seq(10)))
  }

  test("the base is deduped even when its own operator is UNION ALL") {
    assert(rows(
      "WITH RECURSIVE t(n) AS (SELECT 2 UNION ALL SELECT 2 UNION SELECT n + 1 FROM t WHERE n < 4) " +
        "SELECT n FROM t ORDER BY n") == Seq(Seq(2), Seq(3), Seq(4)))
  }

  test("recursion over the corpus through a preceding plain CTE") {
    val got = rows(
      """WITH RECURSIVE base AS (
        |  SELECT TRY_CAST(n AS BIGINT) % 3 AS v FROM files),
        |walk(v) AS (
        |  SELECT v FROM base WHERE v = 0
        |  UNION SELECT (w.v + 2) % 3 FROM walk w)
        |SELECT v FROM walk ORDER BY v""".stripMargin)
    assert(got == Seq(Seq(0L), Seq(1L), Seq(2L)))
  }

  test("string accumulation dedups on the whole row") {
    assert(rows(
      "WITH RECURSIVE t(n, s) AS (SELECT 1, 'a' UNION SELECT n + 1, s || 'b' FROM t WHERE n < 3) " +
        "SELECT n, s FROM t ORDER BY n") ==
      Seq(Seq(1, "a"), Seq(2, "ab"), Seq(3, "abb")))
  }

  test("a non-terminating recursion hits the iteration cap loudly") {
    val ex = intercept[Exception](rows(
      "WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT n + 1 FROM t) " +
        "SELECT count(*) AS c FROM t"))
    assert(ex.getMessage.contains("cteRecursionLevelLimit"))
  }

  test("UNION ALL recursion still runs natively (no fixpoint rewrite)") {
    assert(rows(
      "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 4) " +
        "SELECT CAST(sum(n) AS BIGINT) AS s FROM t") == Seq(Seq(10L)))
  }

  test("a preceding NATIVE UNION ALL recursive CTE feeds a fixpoint member") {
    // the fragment execution must keep the RECURSIVE keyword for the
    // preceding member's own self-reference
    assert(rows(
      """WITH RECURSIVE nat(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM nat WHERE n < 4),
        |walk(v) AS (SELECT n FROM nat WHERE n % 2 = 0
        |  UNION SELECT (w.v + 3) % 6 FROM walk w)
        |SELECT v FROM walk ORDER BY v""".stripMargin) ==
      Seq(Seq(1), Seq(2), Seq(4), Seq(5)))
  }

  test("a repeated statement reuses the memoized fixpoint view") {
    val sql = "WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT (n + 3) % 7 FROM t) " +
      "SELECT count(*) AS c FROM t"
    val a = rows(sql)
    val b = rows(sql)
    assert(a == Seq(Seq(7)) && b == a)
  }
}
