package graft.fm

import java.{util => ju}

/** Minimal TOML parser covering the frontmatter subset python-frontmatter
  * accepts via its TOML handler (`+++` fences): flat and `[table]`-nested
  * key/value pairs with basic/literal strings, integers (with `_`
  * separators), floats, booleans, dates, and single-line arrays. Anything
  * outside the subset throws — surfaced as a per-file parse warning, the
  * same failure channel malformed YAML takes.
  */
object Toml {

  def parse(text: String): ju.LinkedHashMap[String, Any] = {
    val root = new ju.LinkedHashMap[String, Any]()
    var current = root
    text.linesIterator.foreach { rawLine =>
      val line = stripComment(rawLine).trim
      if (line.nonEmpty) {
        if (line.startsWith("[") && line.endsWith("]")) {
          val name = line.substring(1, line.length - 1).trim
          // Dotted headers ([a.b]) nest in tomllib; this subset doesn't —
          // throw (→ parse-warning channel) rather than silently flatten.
          // A quoted key may legitimately contain dots.
          val dotted = !(name.length >= 2 &&
            ((name.head == '"' && name.last == '"') ||
             (name.head == '\'' && name.last == '\''))) && name.contains('.')
          if (name.isEmpty || name.startsWith("[") || dotted)
            throw new IllegalArgumentException(s"unsupported TOML table: $line")
          val tbl = new ju.LinkedHashMap[String, Any]()
          root.put(unquoteKey(name), tbl)
          current = tbl
        } else {
          val eq = indexOfTopLevel(line, '=')
          if (eq < 0) throw new IllegalArgumentException(s"invalid TOML line: $line")
          val key = unquoteKey(line.substring(0, eq).trim)
          val value = parseValue(line.substring(eq + 1).trim)
          current.put(key, value)
        }
      }
    }
    root
  }

  private def stripComment(line: String): String = {
    var inBasic = false
    var inLiteral = false
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '"' if !inLiteral  => inBasic = !inBasic
        case '\'' if !inBasic   => inLiteral = !inLiteral
        case '#' if !inBasic && !inLiteral => return line.substring(0, i)
        case _ =>
      }
      i += 1
    }
    line
  }

  private def indexOfTopLevel(s: String, c: Char): Int = {
    var inBasic = false; var inLiteral = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' if !inLiteral => inBasic = !inBasic
        case '\'' if !inBasic  => inLiteral = !inLiteral
        case x if x == c && !inBasic && !inLiteral => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def unquoteKey(k: String): String =
    if (k.length >= 2 &&
        ((k.head == '"' && k.last == '"') || (k.head == '\'' && k.last == '\'')))
      k.substring(1, k.length - 1)
    else k

  private[fm] def parseValue(v: String): Any = v match {
    case "" => throw new IllegalArgumentException("empty TOML value")
    case "true"  => java.lang.Boolean.TRUE
    case "false" => java.lang.Boolean.FALSE
    case s if s.startsWith("\"") && s.endsWith("\"") && s.length >= 2 =>
      unescapeBasic(s.substring(1, s.length - 1))
    case s if s.startsWith("'") && s.endsWith("'") && s.length >= 2 =>
      s.substring(1, s.length - 1)
    case s if s.startsWith("[") && s.endsWith("]") =>
      val arr = new ju.ArrayList[Any]()
      splitArrayItems(s.substring(1, s.length - 1)).foreach(it => arr.add(parseValue(it.trim)))
      arr
    case s if s.matches("\\d{4}-\\d{2}-\\d{2}([Tt ].*)?") =>
      Frontmatter.temporalFromScalar(s)
    case s if s.matches("[+-]?[0-9_]+") =>
      val n = s.replace("_", "").toLong
      if (n >= Int.MinValue && n <= Int.MaxValue) Integer.valueOf(n.toInt)
      else java.lang.Long.valueOf(n)
    case s if s.matches("[+-]?[0-9_]*\\.?[0-9_]+([eE][+-]?[0-9]+)?") =>
      java.lang.Double.valueOf(s.replace("_", ""))
    case other => throw new IllegalArgumentException(s"unsupported TOML value: $other")
  }

  private def splitArrayItems(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Nil
    val items = Seq.newBuilder[String]
    var depth = 0; var inBasic = false; var inLiteral = false
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' if !inLiteral => inBasic = !inBasic
        case '\'' if !inBasic  => inLiteral = !inLiteral
        case '[' if !inBasic && !inLiteral => depth += 1
        case ']' if !inBasic && !inLiteral => depth -= 1
        case ',' if depth == 0 && !inBasic && !inLiteral =>
          items += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    val last = s.substring(start).trim
    if (last.nonEmpty) items += s.substring(start)
    items.result()
  }

  private def unescapeBasic(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'r' => sb += '\r'; i += 2
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'u' if i + 5 < s.length =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}
