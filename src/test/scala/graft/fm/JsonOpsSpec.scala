package graft.fm

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** `->` / `->>` operator rewrite + json_extract kernel. Every expected
  * value here is pinned against DuckDB v1.0.0 (see Dialect.rewriteJsonOps
  * scaladoc for the precedence pins).
  */
class JsonOpsSpec extends AnyFunSuite {

  private def rw(sql: String): String = Dialect.rewriteJsonOps(sql)

  test("basic ->> and -> on a column") {
    assert(rw("SELECT tags ->> 0 AS t FROM files") ==
      "SELECT json_extract_string(tags, 0) AS t FROM files")
    assert(rw("SELECT tags -> 'a' AS t FROM files") ==
      "SELECT json_extract(tags, 'a') AS t FROM files")
  }

  test("no-space spelling and select-list comma position") {
    assert(rw("SELECT j->>'k', j->'x' FROM t") ==
      "SELECT json_extract_string(j, 'k'), json_extract(j, 'x') FROM t")
  }

  test("chained arrows associate left") {
    assert(rw("SELECT j -> 'a' -> 'b' ->> 'c' FROM t") ==
      "SELECT json_extract_string(json_extract(json_extract(j, 'a'), 'b'), 'c') FROM t")
  }

  test("|| binds into the LHS (same precedence level, left-assoc)") {
    assert(rw("SELECT '{\"a\":' || x || '}' ->> 'a' FROM t") ==
      "SELECT json_extract_string('{\"a\":' || x || '}', 'a') FROM t")
  }

  test("RHS arithmetic binds tighter than the arrow") {
    assert(rw("SELECT j ->> 1 + 1 FROM t") ==
      "SELECT json_extract_string(j, 1 + 1) FROM t")
  }

  test("LHS function call and paren group") {
    assert(rw("SELECT coalesce(a, b) ->> 'k' FROM t") ==
      "SELECT json_extract_string(coalesce(a, b), 'k') FROM t")
    assert(rw("SELECT (j) ->> 'k' FROM t") ==
      "SELECT json_extract_string((j), 'k') FROM t")
  }

  test("string-literal LHS") {
    assert(rw("SELECT '{\"a\":1}' ->> 'a' AS v") ==
      "SELECT json_extract_string('{\"a\":1}', 'a') AS v")
  }

  test("lambda arrows in HOF argument positions are left alone") {
    val l1 = "SELECT list_transform(l, x -> 'c') FROM t"
    assert(rw(l1) == l1)
    val l2 = "SELECT list_filter(l, (x) -> 'c') FROM t"
    assert(rw(l2) == l2)
    val l3 = "SELECT list_reduce(l, (a, b) -> 'c') FROM t"
    assert(rw(l3) == l3)
    // ident-bodied lambdas too: the LHS guard, not the RHS kind, is
    // the discriminator (column-RHS JSON arrows are legal since r14)
    val l4 = "SELECT list_transform(l, x -> x + 1) FROM t"
    assert(rw(l4) == l4)
    val l5 = "SELECT list_transform(l, x -> y) FROM t"
    assert(rw(l5) == l5)
    val l6 = "SELECT array_sort(l, (x, y) -> cmp) FROM t"
    assert(rw(l6) == l6)
  }

  test("column-ref RHS rewrites outside lambda positions (DuckDB dynamic paths)") {
    assert(rw("SELECT j -> k FROM t") ==
      "SELECT json_extract(j, k) FROM t")
    assert(rw("SELECT j -> t.path_col FROM t") ==
      "SELECT json_extract(j, t.path_col) FROM t")
    assert(rw("SELECT j -> concat('$.', k) FROM t") ==
      "SELECT json_extract(j, concat('$.', k)) FROM t")
    assert(rw("SELECT j ->> k FROM t") ==
      "SELECT json_extract_string(j, k) FROM t")
    // chains mix literal and column paths
    assert(rw("SELECT j -> k1 ->> k2 FROM t") ==
      "SELECT json_extract_string(json_extract(j, k1), k2) FROM t")
  }

  test("paren-group RHS rewrites for -> under the lambda guard (r16)") {
    // r16 (verdict r15 "what's missing" item 2): a paren group is a
    // legal lambda BODY, but lambdas only occur as function arguments —
    // exactly the position the LHS guard gates — so outside argument
    // starts (and at whitelisted non-lambda argument starts) the paren
    // RHS is unambiguously JSON and rewrites like the ident RHS.
    assert(rw("SELECT j -> (SELECT p FROM q) FROM t") ==
      "SELECT json_extract(j, (SELECT p FROM q)) FROM t")
    assert(rw("SELECT j -> ('$.' || k) FROM t") ==
      "SELECT json_extract(j, ('$.' || k)) FROM t")
    assert(rw("SELECT coalesce(j -> (1 + 1), '\"x\"') FROM t") ==
      "SELECT coalesce(json_extract(j, (1 + 1)), '\"x\"') FROM t")
    // the guard: a paren-bodied lambda under an UNKNOWN function stays
    // untouched (fails loudly downstream instead of miscompiling)
    val hof = "SELECT weird_hof(l, x -> (x + 1)) FROM t"
    assert(rw(hof) == hof)
    // and under a REAL HOF
    val sortHof = "SELECT array_sort(l, (a, b) -> (CASE WHEN a < b THEN -1 ELSE 1 END)) FROM t"
    assert(rw(sortHof) == sortHof)
    // ->> takes any RHS, including paren groups
    assert(rw("SELECT j ->> (p) FROM t") ==
      "SELECT json_extract_string(j, (p)) FROM t")
  }

  test("JSON arrow inside a lambda body still rewrites") {
    assert(rw("SELECT list_transform(l, x -> j ->> 'k') FROM t") ==
      "SELECT list_transform(l, x -> json_extract_string(j, 'k')) FROM t")
  }

  test("arrows inside string literals and comments are untouched") {
    val s1 = "SELECT '->> not an op' AS v FROM t"
    assert(rw(s1) == s1)
    val s2 = "SELECT 1 AS v -- j ->> 'k'\nFROM t"
    assert(rw(s2) == s2)
  }

  test("WHERE/CASE contexts and comparisons stay outside the arrow") {
    assert(rw("SELECT * FROM t WHERE j ->> 'a' = 'x'") ==
      "SELECT * FROM t WHERE json_extract_string(j, 'a') = 'x'")
    assert(rw("SELECT CASE WHEN j ->> 'a' = '1' THEN 1 ELSE 0 END AS c FROM t") ==
      "SELECT CASE WHEN json_extract_string(j, 'a') = '1' THEN 1 ELSE 0 END AS c FROM t")
  }

  test("bracket-suffixed LHS base") {
    assert(rw("SELECT m['k'] ->> 'a' FROM t") ==
      "SELECT json_extract_string(m['k'], 'a') FROM t")
  }

  // ---- kernel semantics (every value pinned on DuckDB v1.0.0) ----

  private def jx(j: String, p: String, asText: Boolean): String = {
    val r = FnParityOps.jsonExtract(
      UTF8String.fromString(j), UTF8String.fromString(p), asText)
    if (r == null) null else r.toString
  }

  test("kernel: quoting split between -> and ->>") {
    assert(jx("""{"a": "x"}""", "a", asText = false) == "\"x\"")
    assert(jx("""{"a": "x"}""", "a", asText = true) == "x")
    assert(jx("""{"a": {"b": [1,2,3]}}""", "a", asText = false) == """{"b":[1,2,3]}""")
  }

  test("kernel: missing and JSON null both give SQL NULL") {
    assert(jx("""{"a": 1}""", "missing", asText = false) == null)
    assert(jx("""{"a": null}""", "a", asText = false) == null)
    assert(jx("""{"a": null}""", "a", asText = true) == null)
    assert(jx("[10,20,30]", "$[5]", asText = false) == null)
  }

  test("kernel: key-or-index coercion (pinned: '1' indexes arrays, keys objects)") {
    assert(jx("[10,20,30]", "1", asText = true) == "20")
    assert(jx("""{"1": 5}""", "1", asText = true) == "5")
    assert(jx("[10,20,30]", "-1", asText = false) == null)
  }

  test("kernel: path forms — $, slash, quoted segment, from-the-back") {
    assert(jx("""{"a":{"b":2}}""", "$.a.b", asText = true) == "2")
    assert(jx("""{"a":{"b":2}}""", "/a/b", asText = false) == "2")
    assert(jx("""{"a":{"b c":2}}""", "$.a.\"b c\"", asText = false) == "2")
    assert(jx("[1,2,3]", "$[#-1]", asText = false) == "3")
    assert(jx("""{"a":[{"b":1},{"b":2}]}""", "$.a[1].b", asText = false) == "2")
  }

  test("kernel: yyjson number re-serialization") {
    assert(jx("""{"a":1.50}""", "a", asText = false) == "1.5")
    assert(jx("""{"a":1e3}""", "a", asText = false) == "1000.0")
    assert(jx("""{"a":1e20}""", "a", asText = false) == "100000000000000000000.0")
    assert(jx("""{"a":1e-7}""", "a", asText = false) == "1e-7")
    assert(jx("""{"a":0.0001}""", "a", asText = false) == "0.0001")
    assert(jx("""{"a":12345678901234567890123}""", "a", asText = false) ==
      "1.2345678901234568e22")
    assert(jx("""{"a":18446744073709551615}""", "a", asText = false) ==
      "18446744073709551615")
    assert(jx("""{"a":18446744073709551616}""", "a", asText = false) ==
      "18446744073709552000.0")
  }

  test("kernel: escapes round-trip") {
    assert(jx("""{"a":"x\"y"}""", "a", asText = true) == "x\"y")
    assert(jx("""{"a":"x\"y"}""", "a", asText = false) == "\"x\\\"y\"")
  }

  test("kernel: malformed JSON fails loudly (DuckDB errors too)") {
    intercept[IllegalArgumentException](jx("not json", "a", asText = false))
  }

  test("kernel: json_type of out-of-range integers is DOUBLE (yyjson)") {
    def jt(j: String): String = FnParityOps.jsonType(UTF8String.fromString(j)).toString
    def jtAt(j: String, p: String): String =
      FnParityOps.jsonTypeAt(UTF8String.fromString(j), UTF8String.fromString(p)).toString
    // in-range stays exact
    assert(jt("18446744073709551615") == "UBIGINT") // uint64 max
    assert(jt("-9223372036854775808") == "BIGINT") // int64 min
    assert(jt("42") == "UBIGINT")
    assert(jt("-1") == "BIGINT")
    // out of int64/uint64 range: yyjson parses as double
    assert(jt("99999999999999999999999") == "DOUBLE")
    assert(jt("18446744073709551616") == "DOUBLE") // uint64 max + 1
    assert(jt("-99999999999999999999999") == "DOUBLE")
    assert(jt("-9223372036854775809") == "DOUBLE") // int64 min - 1
    assert(jtAt("""{"a":99999999999999999999999}""", "a") == "DOUBLE")
    // json_structure shares the same labeling
    assert(FnParityOps.jsonStructure(
      UTF8String.fromString("[99999999999999999999999, 1]")).toString == """["DOUBLE"]""")
  }
}
