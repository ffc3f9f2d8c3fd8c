package graft.fm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Kernel pins for the scalar parity batch (fmt-style format,
  * strip_accents, unicode, to_base, format_bytes). Every expected value
  * is DuckDB v1.0.0 output; engine-level parity is the `fmt_fns` fuzz
  * family.
  */
class ScalarParitySpec extends AnyFunSuite {
  private def u(s: String) = UTF8String.fromString(s)
  private def fmt(f: String, args: Any*): String =
    ScalarParityOps.format(u(f), args.map {
      case s: String => u(s)
      case v => v.asInstanceOf[Any]
    }.toArray).toString

  test("format: auto and explicit indexes, escapes") {
    assert(fmt("{}={}", "x", 42L) == "x=42")
    assert(fmt("{1}-{0}", "a", "b") == "b-a")
    assert(fmt("{{}} {}", 1L) == "{} 1")
  }

  test("format: width, alignment, zero-pad, grouping, radix, precision") {
    assert(fmt("{:.2f}", 3.14159) == "3.14")
    assert(fmt("{:>6}|", "ab") == "    ab|")
    assert(fmt("{:<6}|", "ab") == "ab    |")
    assert(fmt("{:^6}|", "ab") == "  ab  |")
    assert(fmt("{:05d}", 42L) == "00042")
    assert(fmt("{:x}", 255L) == "ff")
    assert(fmt("{:X}", 255L) == "FF")
    assert(fmt("{:o}", 8L) == "10")
    assert(fmt("{:b}", 5L) == "101")
    assert(fmt("{:,}", 1234567L) == "1,234,567")
  }

  test("format: {} renders integral doubles without the .0") {
    assert(fmt("{}", 42L) == "42")
    assert(fmt("{}", 3.25) == "3.25")
  }

  test("strip_accents drops combining marks only") {
    assert(ScalarParityOps.stripAccents(u("café naïve")).toString == "cafe naive")
    assert(ScalarParityOps.stripAccents(u("Ünïcode")).toString == "Unicode")
    // ł carries no combining mark and survives (DuckDB-identical)
    assert(ScalarParityOps.stripAccents(u("żółć")).toString == "zołc")
  }

  test("unicode: first codepoint, -1 on empty, full astral range") {
    assert(ScalarParityOps.unicode(u("Ab")) == 65)
    assert(ScalarParityOps.unicode(u("")) == -1)
    assert(ScalarParityOps.unicode(u("日本")) == 26085)
  }

  test("to_base: uppercase digits, zero-padding, negative rejected") {
    assert(ScalarParityOps.toBase(255, 16, 0).toString == "FF")
    assert(ScalarParityOps.toBase(10, 2, 0).toString == "1010")
    assert(ScalarParityOps.toBase(255, 16, 6).toString == "0000FF")
    intercept[IllegalArgumentException](ScalarParityOps.toBase(-1, 16, 0))
  }

  test("format_bytes: 'N bytes' below 1 KiB, then one TRUNCATED decimal") {
    assert(ScalarParityOps.formatBytes(999).toString == "999 bytes")
    assert(ScalarParityOps.formatBytes(0).toString == "0 bytes")
    assert(ScalarParityOps.formatBytes(1536).toString == "1.5 KiB")
    // 976.5625 truncates to 976.5 (DuckDB), never rounds to 976.6
    assert(ScalarParityOps.formatBytes(1000000).toString == "976.5 KiB")
    assert(ScalarParityOps.formatBytes(1048576).toString == "1.0 MiB")
  }
}
