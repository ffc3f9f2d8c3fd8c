package graft.fm

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{
  Expression, ImplicitCastInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[DuckRegexpReplace]]. DuckDB semantics verified
  * on v1.0.0:
  *  - without the 'g' flag only the FIRST match is replaced
  *    (`regexp_replace('a1b2','[0-9]','N')` → `aNb2`);
  *  - the replacement uses RE2's `\1`..`\9` backreferences and treats
  *    `$` literally (`'x$y'` stays `x$y`), so both are translated to
  *    Java Matcher spelling;
  *  - flags: 'i' case-insensitive, 'g' global, 'c' case-sensitive
  *    (the default, a no-op); anything else fails loudly rather than
  *    silently diverging from RE2's interpretation.
  */
object DuckRegexOps {

  /** Compiled-pattern cache. BOUNDED: a non-literal regexp argument
    * (pattern taken from a column) would otherwise retain one compiled
    * Pattern per distinct row value forever on every executor JVM; at
    * the bound the cache resets wholesale — recompilation is cheap
    * relative to an unbounded heap (review r10).
    */
  private val patterns = new ConcurrentHashMap[String, Pattern]()
  private val MaxPatterns = 1024

  private def flagBits(flags: String): Int = {
    var bits = 0
    flags.foreach {
      case 'i' => bits |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
      case 'g' | 'c' => ()
      case f => throw new IllegalArgumentException(
        s"unsupported regexp flag '$f' (supported: i, g, c)")
    }
    bits
  }

  private def pattern(re: String, flags: String): Pattern = {
    val bits = flagBits(flags)
    val key = s"$bits:$re"
    val hit = patterns.get(key)
    if (hit != null) hit
    else {
      val p = Pattern.compile(re, bits)
      // At the bound, compile-without-storing: clearing would evict the
      // hot literal patterns every running query uses exactly when a
      // column-sourced pattern floods the cache. putIfAbsent keeps the
      // overshoot to the handful of threads racing one size check.
      if (patterns.size < MaxPatterns) patterns.putIfAbsent(key, p)
      p
    }
  }

  /** Append the RE2-style replacement for one match. Group references
    * are `\N` with EXACTLY one digit (RE2's rewrite grammar — `\10`
    * is group 1 followed by a literal '0', never group 10, which is
    * why this can't be delegated to Java's `Matcher` replacement
    * parser: `$10` there greedily resolves to group 10 when the
    * pattern has one). `\\` is a literal backslash; an unmatched
    * optional group substitutes empty; a reference past the pattern's
    * group count fails loudly, as RE2's rewrite check does.
    */
  private def appendReplacement(m: java.util.regex.Matcher, repl: String,
      sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < repl.length) {
      val c = repl.charAt(i)
      if (c == '\\' && i + 1 < repl.length && Character.isDigit(repl.charAt(i + 1))) {
        val g = repl.charAt(i + 1) - '0'
        if (g > m.groupCount) throw new IllegalArgumentException(
          s"invalid group \\$g in regexp_replace replacement (pattern has ${m.groupCount})")
        val v = m.group(g)
        if (v != null) sb.append(v)
        i += 2
      } else if (c == '\\' && i + 1 < repl.length && repl.charAt(i + 1) == '\\') {
        sb.append('\\'); i += 2
      } else { sb.append(c); i += 1 }
    }
  }

  def replace(s: UTF8String, re: UTF8String, repl: UTF8String,
      flags: UTF8String): UTF8String = {
    val f = flags.toString
    val input = s.toString
    val r = repl.toString
    val m = pattern(re.toString, f).matcher(input)
    val global = f.indexOf('g') >= 0
    // java.lang.StringBuilder, NOT scala's: the 3-arg region append
    // below would silently auto-tuple through scala's append(Any)
    val sb = new java.lang.StringBuilder
    var last = 0
    var found = m.find()
    while (found) {
      sb.append(input, last, m.start())
      appendReplacement(m, r, sb)
      last = m.end()
      // Matcher.find() self-advances past zero-width matches.
      found = global && m.find()
    }
    sb.append(input, last, input.length)
    UTF8String.fromString(sb.toString)
  }
}

/** `regexp_replace(s, re, repl[, flags])` with DuckDB's semantics —
  * registered over Spark's builtin on the dialect sessions because the
  * two genuinely disagree: Spark always replaces every match, DuckDB
  * only the first unless 'g' is given (found by the differential
  * fuzzer; reference passthrough `query.py:72` exposes DuckDB's form).
  */
case class DuckRegexpReplace(str: Expression, regexp: Expression,
    rep: Expression, flags: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {

  override def first: Expression = str
  override def second: Expression = regexp
  override def third: Expression = rep
  override def fourth: Expression = flags
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, StringType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "regexp_replace"

  override def nullSafeEval(s: Any, re: Any, r: Any, f: Any): Any =
    DuckRegexOps.replace(s.asInstanceOf[UTF8String],
      re.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String],
      f.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.fm.DuckRegexOps.replace($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(str = newFirst, regexp = newSecond, rep = newThird, flags = newFourth)
}
