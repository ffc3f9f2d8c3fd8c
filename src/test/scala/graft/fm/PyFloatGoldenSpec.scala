package graft.fm

import org.scalatest.funsuite.AnyFunSuite

/** Golden test for Python `str(float)` parity: 383 doubles (edge cases +
  * random bit patterns + uniform draws) captured from CPython 3.11 as
  * `(little-endian-hex, str(v))` pairs in pyfloat_golden.tsv. The
  * serializer is oracle-visible (ADR-0005, tests/test_query.py:196-218),
  * so any repr divergence is a correctness bug, not a formatting nit.
  */
class PyFloatGoldenSpec extends AnyFunSuite {

  test("pyFloat matches CPython str() on the golden corpus") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/pyfloat_golden.tsv"), "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    assert(lines.nonEmpty)
    val failures = lines.flatMap { line =>
      val Array(hex, expected) = line.split("\t", 2)
      val bits = java.lang.Long.reverseBytes(java.lang.Long.parseUnsignedLong(hex, 16))
      val d = java.lang.Double.longBitsToDouble(bits)
      val actual = PyValue.pyFloat(d)
      if (actual != expected) Some(s"$hex: got '$actual', want '$expected'") else None
    }
    assert(failures.isEmpty,
      s"${failures.length}/${lines.length} mismatches; first: ${failures.take(5).mkString("; ")}")
  }
}
