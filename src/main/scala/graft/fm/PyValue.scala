package graft.fm

import java.{util => ju}
import scala.jdk.CollectionConverters._

/** A YAML temporal scalar kept in its Python string form.
  *
  * PyYAML resolves `2025-11-27` to `datetime.date` and full timestamps to
  * `datetime.datetime`; their `str()` forms differ (reference
  * `query.py:10-20` serializes via `str()`, oracle-visible per
  * `tests/test_query.py:196-218`). SnakeYAML collapses both to
  * `java.util.Date`, losing the distinction, so we construct this instead
  * and compute the Python form from the raw scalar text.
  */
final case class FmTemporal(pyText: String, isDateOnly: Boolean, epochMillis: Long)
    extends Comparable[FmTemporal] {
  override def compareTo(o: FmTemporal): Int = java.lang.Long.compare(epochMillis, o.epochMillis)
  override def toString: String = pyText
}

/** Python-parity value serialization (reference `query.py:10-20`):
  * `None -> NULL`, `list -> json.dumps(v, ensure_ascii=False)`, everything
  * else `str(v)`. The exact string forms are oracle-visible
  * (`tests/test_query.py:196-218`): `42`, `3.14`, `True`, ISO dates, and
  * JSON arrays with a space after commas: `'["a", "b"]'`.
  */
object PyValue {

  /** `_serialize_value` parity: the string stored in the `files` table. */
  def serialize(v: Any): String = v match {
    case null               => null
    case l: ju.List[_]      => jsonDumps(l)
    case other              => pyStr(other)
  }

  /** Python `str()` for YAML-derived scalars/collections. */
  def pyStr(v: Any): String = v match {
    case null                => "None"
    case s: String           => s
    case b: java.lang.Boolean => if (b) "True" else "False"
    case i: java.lang.Integer => i.toString
    case l: java.lang.Long    => l.toString
    case b: java.math.BigInteger => b.toString
    case d: java.lang.Double  => pyFloat(d)
    case t: FmTemporal        => t.pyText
    case m: ju.Map[_, _]      => pyReprMap(m)
    case l: ju.List[_]        => pyReprList(l)
    case b: Array[Byte]       => new String(b, "UTF-8") // YAML !!binary — not produced by SafeConstructor paths we use
    case other                => other.toString
  }

  /** Python `repr()` — used inside `str(dict)` / `str(list)`. */
  def pyRepr(v: Any): String = v match {
    case null                => "None"
    case s: String           => pyStrRepr(s)
    case b: java.lang.Boolean => if (b) "True" else "False"
    case d: java.lang.Double  => pyFloat(d)
    case t: FmTemporal        => temporalRepr(t)
    case m: ju.Map[_, _]      => pyReprMap(m)
    case l: ju.List[_]        => pyReprList(l)
    case other                => pyStr(other)
  }

  private def temporalRepr(t: FmTemporal): String =
    if (t.isDateOnly) {
      val Array(y, m, d) = t.pyText.split("-")
      s"datetime.date(${y.toInt}, ${m.toInt}, ${d.toInt})"
    } else s"datetime.datetime(${t.pyText})" // approximation; not oracle-visible

  private def pyReprList(l: ju.List[_]): String =
    l.asScala.map(pyRepr).mkString("[", ", ", "]")

  private def pyReprMap(m: ju.Map[_, _]): String =
    m.asScala.map { case (k, v) => s"${pyRepr(k)}: ${pyRepr(v)}" }.mkString("{", ", ", "}")

  /** Python string repr: single quotes unless the string contains a single
    * quote and no double quote. Escapes backslash, the quote, and control
    * chars; non-ASCII printable characters stay raw (like Python 3 repr).
    */
  def pyStrRepr(s: String): String = {
    val useDouble = s.contains('\'') && !s.contains('"')
    val q = if (useDouble) '"' else '\''
    val sb = new StringBuilder
    sb += q
    s.foreach {
      case '\\'           => sb ++= "\\\\"
      case c if c == q    => sb += '\\' += q
      case '\n'           => sb ++= "\\n"
      case '\r'           => sb ++= "\\r"
      case '\t'           => sb ++= "\\t"
      case c if c < ' '   => sb ++= f"\\x${c.toInt}%02x"
      case c              => sb += c
    }
    sb += q
    sb.toString
  }

  /** `json.dumps(v, ensure_ascii=False)` parity: `", "` item separator,
    * `": "` key separator, JSON literals for bools/null, Python float repr
    * for numbers, non-ASCII kept raw (ADR-0006 `docs/adr/0006:15-29`).
    */
  def jsonDumps(v: Any): String = v match {
    case null                 => "null"
    case b: java.lang.Boolean => if (b) "true" else "false"
    case i: java.lang.Integer => i.toString
    case l: java.lang.Long    => l.toString
    case b: java.math.BigInteger => b.toString
    case d: java.lang.Double  => jsonFloat(d)
    case s: String            => jsonStringQuote(s)
    case l: ju.List[_]        => l.asScala.map(jsonDumps).mkString("[", ", ", "]")
    case m: ju.Map[_, _] =>
      m.asScala
        .map { case (k, v2) => s"${jsonStringQuote(jsonKey(k))}: ${jsonDumps(v2)}" }
        .mkString("{", ", ", "}")
    case other =>
      // json.dumps raises TypeError for dates etc.; callers surface this
      // as a per-file warning (reference would error the whole query).
      throw new IllegalArgumentException(
        s"Object of type ${other.getClass.getSimpleName} is not JSON serializable")
  }

  /** json.dumps key coercion for non-string keys. */
  private def jsonKey(k: Any): String = k match {
    case s: String            => s
    case b: java.lang.Boolean => if (b) "true" else "false"
    case null                 => "null"
    case d: java.lang.Double  => jsonFloat(d)
    case other                => other.toString
  }

  private def jsonStringQuote(s: String): String = {
    val sb = new StringBuilder
    sb += '"'
    s.foreach {
      case '"'          => sb ++= "\\\""
      case '\\'         => sb ++= "\\\\"
      case '\n'         => sb ++= "\\n"
      case '\r'         => sb ++= "\\r"
      case '\t'         => sb ++= "\\t"
      case '\b'         => sb ++= "\\b"
      case '\f'         => sb ++= "\\f"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c            => sb += c
    }
    sb += '"'
    sb.toString
  }

  private def jsonFloat(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else pyFloat(d)

  /** Python `repr(float)`: shortest round-trip digits, positional form for
    * decimal exponent in [-4, 16), otherwise `d.ddde+EE` scientific with a
    * signed two-digit-minimum exponent. Digits come from
    * `java.lang.Double.toString` (shortest round-trip on modern JDKs).
    */
  /** (shortest round-trip digit string, power of ten of the leading
    * digit) for a finite non-zero |d| — the digit engine shared by
    * [[pyFloat]] (Python repr formatting) and the yyjson double writer
    * in [[FnParityOps]] (DuckDB JSON re-serialization).
    */
  private[fm] def shortestDigits(abs: Double): (String, Int) = {
    val s = java.lang.Double.toString(abs)
    // Java forms: "123.45" or "1.2345E12" — mantissa always contains '.'
    val (mant, exp10) = s.indexOf('E') match {
      case -1 => (s, 0)
      case i  => (s.substring(0, i), s.substring(i + 1).toInt)
    }
    val dot = mant.indexOf('.')
    val digitsRaw = (mant.substring(0, dot) + mant.substring(dot + 1))
    // e = power of ten of the leading digit
    var e = dot - 1 + exp10
    var digits = digitsRaw.dropWhile(_ == '0')
    e -= (digitsRaw.length - digits.length)
    if (digits.isEmpty) { digits = "0"; e = 0 }
    digits = digits.reverse.dropWhile(_ == '0').reverse
    if (digits.isEmpty) digits = "0"
    // Java's pre-Ryu toString is not always shortest (e.g. 4.9E-324 where
    // Python prints 5e-324): find the shortest rounding that round-trips.
    if (digits.length > 1) {
      val full = new java.math.BigDecimal("0." + digits).movePointRight(e + 1)
      var L = 1
      var done = false
      while (!done && L < digits.length) {
        val r = full.round(new java.math.MathContext(L, java.math.RoundingMode.HALF_EVEN))
        if (r.doubleValue() == abs) {
          val unscaled = r.unscaledValue.toString
          e = (unscaled.length - 1) - r.scale
          digits = unscaled.reverse.dropWhile(_ == '0').reverse
          if (digits.isEmpty) digits = "0"
          done = true
        }
        L += 1
      }
    }
    (digits, e)
  }

  def pyFloat(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d == Double.PositiveInfinity) return "inf"
    if (d == Double.NegativeInfinity) return "-inf"
    val neg = (d < 0.0) || (d == 0.0 && 1.0 / d < 0)
    val sign = if (neg) "-" else ""
    if (d == 0.0) return sign + "0.0"
    val (digits, e) = shortestDigits(math.abs(d))
    if (e >= -4 && e < 16) {
      if (e >= digits.length - 1) {
        // integer-valued: pad zeros, append ".0"
        sign + digits.padTo(e + 1, '0') + ".0"
      } else if (e >= 0) {
        sign + digits.substring(0, e + 1) + "." + digits.substring(e + 1)
      } else {
        sign + "0." + ("0" * (-e - 1)) + digits
      }
    } else {
      val m =
        if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      val es = if (e < 0) "-" else "+"
      val ea = math.abs(e)
      val ep = if (ea < 10) s"0$ea" else ea.toString
      s"$sign${m}e$es$ep"
    }
  }
}
