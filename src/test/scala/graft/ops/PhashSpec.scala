package graft.ops

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The one-pass phash kernel vs CPython-computed pins of the shared
  * SQL formula (px(j) = codepoint at (j*nc) DIV p + 1, bit j iff
  * px(j)*p > Σpx). The r13 verify caught a hardcoded p=64 against the
  * catalog's p=60 — these pins hold the parameterization down.
  */
class PhashSpec extends AnyFunSuite {
  private def ph(s: String, p: Int = 60): Long =
    PhashOps.phash(UTF8String.fromString(s), p)

  test("pinned values at p = 60 (CPython reference)") {
    val t = ("the quick brown fox jumps over the lazy dog " * 20).trim
    assert(ph(t) == 988218432520154551L)
    // multibyte codepoints sample by CHARACTER position, not byte
    assert(ph("héllo wörld — ünïcode test string here") == 1572864L)
    // texts shorter than p resample the same characters
    assert(ph("ab") == 1152921503533105152L)
  }

  test("p parameterizes both the sampling grid and the threshold") {
    val t = "abcdefghijklmnopqrstuvwxyz0123456789"
    assert(ph(t, 60) != ph(t, 32) || ph(t, 60) != ph(t, 16))
  }

  test("empty text guard") {
    assert(ph("", 60) == 0L)
  }
}
