package graft.fm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Kernel-level pins for the string-similarity family. Every expected
  * value is DuckDB v1.0.0 output, captured via the oracle binary before
  * the kernels were written; engine-level parity over real corpora is
  * the `strdist` fuzz family.
  */
class StringDistanceSpec extends AnyFunSuite {
  private def u(s: String) = UTF8String.fromString(s)

  test("jaccard is over CHARACTER SETS; empty input errors like DuckDB") {
    assert(StrDistOps.jaccard(u("duck"), u("luck")) == 0.6)
    assert(StrDistOps.jaccard(u("abc"), u("abc")) == 1.0)
    assert(StrDistOps.jaccard(u("a"), u("b")) == 0.0)
    // repeated chars collapse into the set
    assert(StrDistOps.jaccard(u("aaab"), u("ab")) == 1.0)
    intercept[IllegalArgumentException](StrDistOps.jaccard(u(""), u("a")))
  }

  test("jaro: classic values; any empty argument is 0.0 (DuckDB, not the textbook 1.0)") {
    assert(math.abs(StrDistOps.jaro(u("martha"), u("marhta")) - 0.9444444444444445) < 1e-15)
    assert(StrDistOps.jaro(u("duck"), u("luck")) == 0.8333333333333334)
    assert(StrDistOps.jaro(u(""), u("")) == 0.0)
    assert(StrDistOps.jaro(u("ab"), u("")) == 0.0)
    assert(StrDistOps.jaro(u("a"), u("a")) == 1.0)
  }

  test("jaro-winkler boosts only above the 0.7 threshold") {
    assert(math.abs(StrDistOps.jaroWinkler(u("martha"), u("marhta")) - 0.9611111111111111) < 1e-15)
    // jaro = 0.6 with a 4-char common prefix: DuckDB applies NO boost
    assert(StrDistOps.jaroWinkler(u("abcdxxxxxx"), u("abcdyyyyyy")) == 0.6)
    assert(StrDistOps.jaro(u("abcdxxxxxx"), u("abcdyyyyyy")) == 0.6)
  }

  test("damerau-levenshtein is the TRUE (unrestricted) variant") {
    assert(StrDistOps.damerauLevenshtein(u("abc"), u("acb")) == 1L)
    // OSA would say 3; true DL (delete 'c', transpose around) says 2
    assert(StrDistOps.damerauLevenshtein(u("ca"), u("abc")) == 2L)
    assert(StrDistOps.damerauLevenshtein(u(""), u("abc")) == 3L)
    assert(StrDistOps.damerauLevenshtein(u("ab"), u("")) == 2L)
    assert(StrDistOps.damerauLevenshtein(u("same"), u("same")) == 0L)
  }

  test("hamming requires equal lengths, DuckDB's message shape") {
    assert(StrDistOps.hamming(u("abc"), u("abd")) == 1L)
    assert(StrDistOps.hamming(u("abc"), u("abc")) == 0L)
    intercept[IllegalArgumentException](StrDistOps.hamming(u("ab"), u("abc")))
  }
}
