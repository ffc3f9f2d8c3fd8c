package graft.fm

import java.{util => ju}
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the oracle-visible string forms asserted by the reference at
  * tests/test_query.py:196-218 and the ADR-0005/0006 serialization rules.
  */
class PyValueSpec extends AnyFunSuite {

  test("str() parity for scalars (tests/test_query.py:196-218)") {
    assert(PyValue.serialize("string") == "string")
    assert(PyValue.serialize(Integer.valueOf(42)) == "42")
    assert(PyValue.serialize(java.lang.Double.valueOf(3.14)) == "3.14")
    assert(PyValue.serialize(java.lang.Boolean.TRUE) == "True")
    assert(PyValue.serialize(java.lang.Boolean.FALSE) == "False")
    assert(PyValue.serialize(null) == null)
  }

  test("ISO date str() parity") {
    val d = Frontmatter.temporalFromScalar("2025-11-27")
    assert(PyValue.serialize(d) == "2025-11-27")
    assert(PyValue.pyRepr(d) == "datetime.date(2025, 11, 27)")
  }

  test("json.dumps parity: comma-space arrays, JSON literals, unicode raw") {
    val l = ju.List.of("a", "b")
    assert(PyValue.serialize(l) == "[\"a\", \"b\"]")
    val mixed = new ju.ArrayList[Any]()
    mixed.add("a"); mixed.add(Integer.valueOf(1)); mixed.add(java.lang.Boolean.TRUE); mixed.add(null)
    assert(PyValue.jsonDumps(mixed) == "[\"a\", 1, true, null]")
    assert(PyValue.jsonDumps(ju.List.of("日本語")) == "[\"日本語\"]")
    // nested arrays survive as nested JSON (tests/test_server.py:331-339)
    assert(PyValue.jsonDumps(ju.List.of(ju.List.of("x", "y"), "z")) == "[[\"x\", \"y\"], \"z\"]")
  }

  test("json.dumps escapes and key coercion") {
    assert(PyValue.jsonDumps(ju.List.of("a\"b", "c\\d", "e\nf")) == "[\"a\\\"b\", \"c\\\\d\", \"e\\nf\"]")
    val m = new ju.LinkedHashMap[Any, Any]()
    m.put("k", "v"); m.put(Integer.valueOf(1), Integer.valueOf(2))
    assert(PyValue.jsonDumps(ju.List.of(m)) == "[{\"k\": \"v\", \"1\": 2}]")
  }

  test("float repr parity (Python repr rules)") {
    assert(PyValue.pyFloat(3.14) == "3.14")
    assert(PyValue.pyFloat(50.0) == "50.0")
    assert(PyValue.pyFloat(-4.8) == "-4.8")
    assert(PyValue.pyFloat(0.0001) == "0.0001")
    assert(PyValue.pyFloat(0.00001) == "1e-05")
    assert(PyValue.pyFloat(1e16) == "1e+16")
    assert(PyValue.pyFloat(1.5e20) == "1.5e+20")
    assert(PyValue.pyFloat(1e15) == "1000000000000000.0")
    assert(PyValue.pyFloat(0.0) == "0.0")
    assert(PyValue.pyFloat(1.0e-4) == "0.0001")
    assert(PyValue.pyFloat(123456789.123) == "123456789.123")
  }

  test("str(dict) uses Python repr forms") {
    val m = new ju.LinkedHashMap[Any, Any]()
    m.put("a", "x"); m.put("n", Integer.valueOf(1)); m.put("b", java.lang.Boolean.TRUE)
    assert(PyValue.pyStr(m) == "{'a': 'x', 'n': 1, 'b': True}")
    assert(PyValue.pyStrRepr("it's") == "\"it's\"")
    assert(PyValue.pyStrRepr("a'b\"c") == "'a\\'b\"c'")
  }
}
