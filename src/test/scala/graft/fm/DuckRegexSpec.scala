package graft.fm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Kernel-level pins for the DuckDB-semantics regexp_replace (the
  * engine-level parity is covered by the differential fuzzer's
  * regex_fns family). Every expected value here is DuckDB v1.0.0
  * output, captured before the expression was written.
  */
class DuckRegexSpec extends AnyFunSuite {

  private def rep(s: String, re: String, r: String, f: String = ""): String =
    DuckRegexOps.replace(UTF8String.fromString(s), UTF8String.fromString(re),
      UTF8String.fromString(r), UTF8String.fromString(f)).toString

  test("default replaces only the FIRST match; 'g' replaces all") {
    assert(rep("a1b2", "[0-9]", "N") == "aNb2")
    assert(rep("a1b2", "[0-9]", "N", "g") == "aNbN")
    assert(rep("zzz", "[0-9]", "N") == "zzz")
  }

  test("'i' folds case; 'c' is the case-sensitive no-op default") {
    assert(rep("DOC", "doc", "x", "i") == "x")
    assert(rep("DOC", "doc", "x", "c") == "DOC")
    assert(rep("DoCdOc", "doc", "x", "ig") == "xx")
  }

  test("RE2 replacement spelling: \\N backrefs, literal $, literal backslash") {
    assert(rep("a1b2", "([a-z])([0-9])", "\\2\\1", "g") == "1a2b")
    assert(rep("a$b", "a", "x$y") == "x$y$b")
    assert(rep("ab", "(a)", "\\\\\\1", "g") == "\\ab")
  }

  test("unknown flags fail loudly") {
    intercept[IllegalArgumentException](rep("a", "a", "b", "z"))
  }

  test("RE2 group refs are single-digit: \\10 is group 1 + literal '0'") {
    // Java's Matcher replacement would greedily read $10 as group 10
    // here — RE2 (and DuckDB) always read one digit (advice r10).
    assert(rep("abcdefghij",
      "(a)(b)(c)(d)(e)(f)(g)(h)(i)(j)", "\\10") == "a0")
  }

  test("unmatched optional group substitutes empty; bad group fails") {
    assert(rep("b", "(a)?(b)", "[\\1][\\2]") == "[][b]")
    intercept[IllegalArgumentException](rep("a", "(a)", "\\2"))
  }

  test("trailing lone backslash stays literal") {
    assert(rep("a", "a", "x\\") == "x\\")
  }
}
