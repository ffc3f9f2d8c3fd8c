package graft.fm

import org.scalatest.funsuite.AnyFunSuite

class DialectSpec extends AnyFunSuite {

  test("FROM-position UNNEST with AS t(c) — README.md:304-310 idiom") {
    val in = """SELECT tag, COUNT(*) FROM files, UNNEST(from_json(tags, '["VARCHAR"]')) AS t(tag) GROUP BY tag"""
    val out = Dialect.rewrite(in)
    assert(out.contains("LATERAL VIEW explode(from_json(tags, 'array<string>')) t AS tag"))
    assert(!out.toUpperCase.contains("UNNEST"))
  }

  test("UNNEST with AS col and bare UNNEST") {
    assert(Dialect.rewriteUnnest("SELECT x FROM t, UNNEST(a) AS x")
      .contains("LATERAL VIEW explode(a) _unnest AS x"))
    assert(Dialect.rewriteUnnest("SELECT unnest FROM t, UNNEST(a)")
      .contains("LATERAL VIEW explode(a) _unnest AS unnest"))
  }

  test("projection-position UNNEST is left alone") {
    val in = "SELECT a, UNNEST(x) FROM t"
    assert(Dialect.rewriteUnnest(in) == in)
  }

  test("from_json schema hints") {
    assert(Dialect.hintToDdl("[\"VARCHAR\"]").contains("array<string>"))
    assert(Dialect.hintToDdl("[\"\"]").contains("array<string>"))
    assert(Dialect.hintToDdl("[[\"VARCHAR\"]]").contains("array<array<string>>"))
    assert(Dialect.hintToDdl("{\"a\": \"INT\"}").contains("struct<a:bigint>"))
    assert(Dialect.hintToDdl("not a hint").isEmpty)
    // ordinary string literals survive
    assert(Dialect.rewriteFromJsonHints("SELECT '[x' FROM t") == "SELECT '[x' FROM t")
  }

  test("multiple UNNESTs rewrite iteratively") {
    val in = "SELECT * FROM t, UNNEST(a) AS x(u), UNNEST(b) AS y(v)"
    val out = Dialect.rewriteUnnest(in)
    assert(out.contains("LATERAL VIEW explode(a) x AS u"))
    assert(out.contains("LATERAL VIEW explode(b) y AS v"))
  }
}
