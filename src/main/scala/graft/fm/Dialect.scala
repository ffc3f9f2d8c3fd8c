package graft.fm

import org.apache.spark.sql.SparkSession

/** DuckDB-dialect compatibility for the SQL passthrough surface the
  * reference declares (SURVEY.md §2 B10–B12):
  *
  *  - `FROM t, UNNEST(expr) AS a(c)` → `FROM t LATERAL VIEW explode(expr)
  *    a AS c` (Spark SQL has no FROM-position UNNEST; reference idiom at
  *    README.md:304-310, `tests/test_query.py:127-130`);
  *  - `from_json(x, '["VARCHAR"]')` DuckDB schema hints → Spark DDL type
  *    strings (`docs/adr/0006:26-36`);
  *  - `list_contains` → `array_contains` (`tests/test_query.py:98`),
  *    `string_split` → `split`, registered as function aliases.
  */
object Dialect {

  /** Register DuckDB-named function aliases on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions._
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "list_contains", exprs => ArrayContains(exprs(0), exprs(1)), "built-in")
    // Note: Spark's split() takes a Java regex; DuckDB's separator is a
    // literal. Identical for the plain separators the reference exercises.
    reg.createOrReplaceTempFunction(
      "string_split", exprs => StringSplit(exprs(0), exprs(1), Literal(-1)), "built-in")
    // DuckDB's len() over the files table always sees strings (arrays are
    // JSON-encoded per ADR-0006), so character length is the right map.
    reg.createOrReplaceTempFunction(
      "len", exprs => Length(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "regexp_matches", exprs => RLike(exprs(0), exprs(1)), "built-in")
  }

  def rewrite(sql: String): String = rewriteFromJsonHints(rewriteUnnest(sql))

  /** Length-preserving comment mask: every character inside a `--` line
    * comment or a bracketed comment is replaced by a space, so
    * index-based syntax scanning (quote parity, paren matching, keyword
    * search) never sees quotes or parens that live in comments, while
    * splice positions stay aligned with the original text. Comment
    * openers inside single-quoted literals are data and left alone.
    */
  private[fm] def maskComments(sql: String): String = {
    val a = sql.toCharArray
    var i = 0
    var inStr = false
    while (i < a.length) {
      val c = a(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; i += 1 }
      else if (c == '-' && i + 1 < a.length && a(i + 1) == '-') {
        while (i < a.length && a(i) != '\n') { a(i) = ' '; i += 1 }
      } else if (c == '/' && i + 1 < a.length && a(i + 1) == '*') {
        a(i) = ' '; a(i + 1) = ' '; i += 2
        while (i < a.length && !(a(i) == '*' && i + 1 < a.length && a(i + 1) == '/')) {
          a(i) = ' '; i += 1
        }
        if (i + 1 < a.length) { a(i) = ' '; a(i + 1) = ' '; i += 2 }
        else if (i < a.length) { a(i) = ' '; i += 1 }
      } else i += 1
    }
    new String(a)
  }

  /** DuckDB JSON-literal schema hints — rewritten ONLY when they are the
    * second argument of a `from_json(...)` call. A bare `'[]'` elsewhere
    * in the query is DATA (the JSON encoding of an empty array, which the
    * files table stores per ADR-0006) and must pass through untouched.
    */
  private[fm] def rewriteFromJsonHints(sql: String): String = {
    val m = maskComments(sql)
    val u = m.toUpperCase
    val out = new StringBuilder
    var i = 0
    var last = 0
    while (i >= 0 && i < sql.length) {
      i = u.indexOf("FROM_JSON", i)
      if (i >= 0) {
        val insideLiteral = m.substring(0, i).count(_ == '\'') % 2 == 1
        var k = i + "FROM_JSON".length
        while (k < m.length && Character.isWhitespace(m.charAt(k))) k += 1
        if (!insideLiteral && k < m.length && m.charAt(k) == '(') {
          val close = matchParen(m, k)
          if (close > 0) {
            // Scan argument structure on the masked text (quotes/parens in
            // comments are spaces there); extract arg text from the original.
            val bounds = splitTopLevelArgs(m.substring(k + 1, close))
            val args = bounds.map { case (s0, e0) => sql.substring(k + 1 + s0, k + 1 + e0) }
            val argsMasked = bounds.map { case (s0, e0) => m.substring(k + 1 + s0, k + 1 + e0) }
            val rewrittenArgs =
              if (args.length >= 2) {
                val a2 = argsMasked(1).trim
                val hinted =
                  if (a2.length >= 2 && a2.head == '\'' && a2.last == '\'')
                    hintToDdl(a2.substring(1, a2.length - 1)).map(d => s"'$d'")
                  else None
                hinted match {
                  case Some(h) =>
                    val a2raw = argsMasked(1)
                    val lead = a2raw.takeWhile(_.isWhitespace)
                    val trail = a2raw.reverse.takeWhile(_.isWhitespace).reverse
                    args.updated(1, lead + h + trail)
                  case None => args
                }
              } else args
            out.append(sql.substring(last, k + 1))
            // recurse for nested from_json in the first argument
            out.append(rewrittenArgs.map(rewriteFromJsonHints).mkString(","))
            out.append(')')
            last = close + 1
            i = close + 1
          } else i = k
        } else i = k
      }
    }
    out.append(sql.substring(last))
    out.toString
  }

  /** Split a paren-free-at-top-level argument list into (start, end)
    * index pairs, respecting nested parens and single-quoted literals.
    * Callers pass the MASKED text so comment contents never confuse the
    * scan, then slice the original at the returned boundaries.
    */
  private def splitTopLevelArgs(s: String): Vector[(Int, Int)] = {
    val args = Vector.newBuilder[(Int, Int)]
    var depth = 0
    var inStr = false
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == ',' && depth == 0) { args += ((start, i)); start = i + 1 }
      i += 1
    }
    args += ((start, s.length))
    args.result()
  }

  /** `["VARCHAR"]` → `array<string>`, `[""]` → `array<string>`,
    * `{"a": "INT"}` → `struct<a:bigint>`; None when not a recognizable
    * hint (leaves ordinary string literals untouched).
    */
  private[fm] def hintToDdl(hint: String): Option[String] = {
    def typeName(t: String): Option[String] = t.trim.stripPrefix("\"").stripSuffix("\"").toUpperCase match {
      case "VARCHAR" | "TEXT" | "STRING" | "" => Some("string")
      case "INT" | "INTEGER" | "BIGINT"       => Some("bigint")
      case "DOUBLE" | "FLOAT" | "REAL"        => Some("double")
      case "BOOLEAN" | "BOOL"                 => Some("boolean")
      case "DATE"                             => Some("date")
      case _                                  => None
    }
    val t = hint.trim
    if (t.startsWith("[") && t.endsWith("]")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.startsWith("[") && inner.endsWith("]"))
        hintToDdl(inner).map(i => s"array<$i>")
      else typeName(inner).map(i => s"array<$i>")
    } else if (t.startsWith("{") && t.endsWith("}")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) None
      else {
        val fields = inner.split(",").toSeq.map { f =>
          f.split(":") match {
            case Array(k, v) =>
              typeName(v).map(tn => s"${k.trim.stripPrefix("\"").stripSuffix("\"")}:$tn")
            case _ => None
          }
        }
        if (fields.forall(_.isDefined)) Some(s"struct<${fields.flatten.mkString(",")}>")
        else None
      }
    } else None
  }

  /** FROM-position lateral UNNEST → LATERAL VIEW explode. Handles
    * `, UNNEST(expr) AS alias(col)`, `, UNNEST(expr) AS col`, and bare
    * `, UNNEST(expr)` (column named `unnest`, DuckDB's default). Only
    * rewrites when the preceding non-space char is a comma in FROM
    * context (so `SELECT a, UNNEST(x)` projections are left alone).
    */
  private[fm] def rewriteUnnest(sql: String): String = {
    var out = sql
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false
      guard += 1
      // All syntax decisions scan the masked text (comments → spaces, so a
      // quote or comma living in a comment is never syntax and a comment
      // between ',' and UNNEST reads as whitespace); replacement text is
      // sliced from the original.
      val msk = maskComments(out)
      val u = msk.toUpperCase
      var i = u.indexOf("UNNEST")
      while (i >= 0 && !changed) {
        // preceding non-whitespace must be ','; occurrences inside
        // single-quoted string literals are data, not syntax (doubled ''
        // escapes keep the parity count correct)
        var j = i - 1
        while (j >= 0 && Character.isWhitespace(msk.charAt(j))) j -= 1
        val insideLiteral = msk.substring(0, i).count(_ == '\'') % 2 == 1
        val inFrom = !insideLiteral &&
          j >= 0 && msk.charAt(j) == ',' && fromContext(u, j)
        if (inFrom) {
          // parse UNNEST ( <balanced> )
          var k = i + "UNNEST".length
          while (k < msk.length && Character.isWhitespace(msk.charAt(k))) k += 1
          if (k < msk.length && msk.charAt(k) == '(') {
            val close = matchParen(msk, k)
            if (close > 0) {
              val expr = out.substring(k + 1, close)
              // optional: AS alias(col) | AS col
              var p = close + 1
              while (p < msk.length && Character.isWhitespace(msk.charAt(p))) p += 1
              var alias = "_unnest"
              var colName = "unnest"
              var end = close + 1
              if (p + 2 <= msk.length && u.startsWith("AS", p)) {
                var q = p + 2
                while (q < msk.length && Character.isWhitespace(msk.charAt(q))) q += 1
                val identEnd = identEndAt(msk, q)
                if (identEnd > q) {
                  val ident = out.substring(q, identEnd)
                  var r = identEnd
                  while (r < msk.length && Character.isWhitespace(msk.charAt(r))) r += 1
                  if (r < msk.length && msk.charAt(r) == '(') {
                    val pc = matchParen(msk, r)
                    if (pc > 0) {
                      alias = ident
                      colName = out.substring(r + 1, pc).trim
                      end = pc + 1
                    }
                  } else {
                    alias = "_unnest"
                    colName = ident
                    end = identEnd
                  }
                }
              }
              val replacement = s" LATERAL VIEW explode($expr) $alias AS $colName"
              out = out.substring(0, j) + replacement + out.substring(end)
              changed = true
            }
          }
        }
        if (!changed) i = u.indexOf("UNNEST", i + 1)
      }
    }
    out
  }

  /** Heuristic: walking backwards from position `j`, the nearest governing
    * clause keyword at the same paren depth is FROM (not SELECT/WHERE/…).
    */
  private def fromContext(upper: String, j: Int): Boolean = {
    var depth = 0
    var i = j
    while (i >= 0) {
      val c = upper.charAt(i)
      if (c == ')') depth += 1
      else if (c == '(') { if (depth == 0) return false; depth -= 1 }
      else if (depth == 0 && isKeywordAt(upper, i, "FROM")) return true
      else if (depth == 0 && (isKeywordAt(upper, i, "SELECT") || isKeywordAt(upper, i, "WHERE")))
        return false
      i -= 1
    }
    false
  }

  private def isKeywordAt(upper: String, endIdx: Int, kw: String): Boolean = {
    val start = endIdx - kw.length + 1
    start >= 0 &&
    upper.regionMatches(start, kw, 0, kw.length) &&
    (start == 0 || !Character.isLetterOrDigit(upper.charAt(start - 1))) &&
    (endIdx == upper.length - 1 || !Character.isLetterOrDigit(upper.charAt(endIdx + 1)))
  }

  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  private def identEndAt(s: String, start: Int): Int = {
    var i = start
    while (i < s.length && (Character.isLetterOrDigit(s.charAt(i)) || s.charAt(i) == '_')) i += 1
    i
  }
}
