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
      if (patterns.size >= MaxPatterns) patterns.clear()
      patterns.put(key, p)
      p
    }
  }

  /** RE2 replacement string → Java Matcher replacement: `\N` backrefs
    * become `$N`, a literal `$` is escaped, a lone or doubled backslash
    * stays a literal backslash.
    */
  private[fm] def javaReplacement(r: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < r.length) {
      val c = r.charAt(i)
      if (c == '\\' && i + 1 < r.length && Character.isDigit(r.charAt(i + 1))) {
        sb.append('$').append(r.charAt(i + 1)); i += 2
      } else if (c == '\\' && i + 1 < r.length && r.charAt(i + 1) == '\\') {
        sb.append("\\\\"); i += 2
      } else if (c == '\\') { sb.append("\\\\"); i += 1 }
      else if (c == '$') { sb.append("\\$"); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def replace(s: UTF8String, re: UTF8String, repl: UTF8String,
      flags: UTF8String): UTF8String = {
    val f = flags.toString
    val m = pattern(re.toString, f).matcher(s.toString)
    val out =
      if (f.indexOf('g') >= 0) m.replaceAll(javaReplacement(repl.toString))
      else m.replaceFirst(javaReplacement(repl.toString))
    UTF8String.fromString(out)
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
