package graft.fm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the NullabilityGuard fix: `['a', col][1]`-style bracket
  * indexing desugars to (try_)element_at over a literal CreateArray,
  * whose Spark codegen is uncompilable when the constant index makes
  * ElementAt claim nullable=false — before the guard, every such row
  * silently paid the interpreted-projection fallback. With codegen
  * fallback DISABLED these queries would throw if the generated code
  * regressed to the broken shape.
  */
class GuardExpressionsSpec extends AnyFunSuite {

  private lazy val session = {
    val s = TestSpark.spark.newSession()
    // Fail the test instead of silently interpreting: any codegen
    // compile error in these plans becomes a thrown exception.
    s.conf.set("spark.sql.codegen.fallback", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    Dialect.register(s)
    Dialect.registerOverrides(s)
    import s.implicits._
    Seq(("a.md", "en"), ("b.md", null)).toDF("path", "lang")
      .createOrReplaceTempView("t")
    s
  }

  test("constant index into a literal array compiles under codegen-only") {
    val rows = session.sql(
      "SELECT try_element_at(array('a', lang, path), 1) AS x, " +
        "element_at(array('a', lang, path), 2) AS y, " +
        "map_extract(map('k', lang), 'k') AS z FROM t ORDER BY path")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "a"))
    assert(rows.map(_.getString(1)).toSeq == Seq("en", null))
    assert(rows.map(_.getString(2)).toSeq == Seq("en", null))
  }

  test("out-of-bounds and negative indices keep NULL/None semantics") {
    val rows = session.sql(
      "SELECT try_element_at(array('a', lang), 9) AS far, " +
        "try_element_at(array('a', lang), -1) AS last FROM t ORDER BY path")
      .collect()
    assert(rows.map(_.isNullAt(0)).toSeq == Seq(true, true))
    assert(rows.map(_.getString(1)).toSeq == Seq("en", null))
  }
}
