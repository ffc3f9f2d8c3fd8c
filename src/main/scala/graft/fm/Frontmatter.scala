package graft.fm

import java.{util => ju}
import scala.util.matching.Regex

import org.yaml.snakeyaml.{DumperOptions, LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor
import org.yaml.snakeyaml.nodes.{Node, ScalarNode, Tag}
import org.yaml.snakeyaml.representer.Representer

/** A parsed Markdown document: frontmatter mapping + body.
  * Mirrors python-frontmatter's `Post` (metadata, content, handler):
  * the handler detected at load time is carried so `dumps` re-emits the
  * same format — mutating a `+++` TOML or brace-fenced JSON file must
  * not silently convert it to YAML (python-frontmatter `dump` keeps
  * `post.handler`; reference `files.py:142-145`).
  */
final case class Post(
    metadata: ju.LinkedHashMap[String, Any],
    content: String,
    handler: String = Post.Yaml)

object Post {
  val Yaml = "yaml"
  val Json = "json"
  val Toml = "toml"
}

/** Frontmatter split/parse/dump with python-frontmatter semantics
  * (reference delegates to it at `files.py:52-67`, `files.py:110-150`):
  *
  *  - input is stripped; frontmatter exists iff the text starts with a
  *    boundary line of 3+ dashes and a second boundary follows
  *    (python-frontmatter `YAMLHandler.FM_BOUNDARY = ^-{3,}\s*$` MULTILINE);
  *  - the YAML block loads with safe construction; a non-mapping result
  *    yields empty metadata;
  *  - body is the text after the second boundary, stripped;
  *  - timestamps become [[FmTemporal]] so Python `str(date)` forms survive.
  */
object Frontmatter {

  private val boundary: Regex = "(?m)^-{3,}[ \t\f\r]*$".r

  private def newYaml(): Yaml = {
    val opts = new LoaderOptions
    val ctor = new SafeConstructor(opts) {
      // Replace timestamp construction: keep the Python string form.
      yamlConstructors.put(Tag.TIMESTAMP, new org.yaml.snakeyaml.constructor.AbstractConstruct {
        override def construct(node: Node): AnyRef = {
          val raw = node.asInstanceOf[ScalarNode].getValue
          Frontmatter.temporalFromScalar(raw)
        }
      })
    }
    new Yaml(ctor)
  }

  /** YAML timestamp scalar → [[FmTemporal]] with PyYAML `str()` parity for
    * the date-only and second-precision forms.
    */
  private[fm] def temporalFromScalar(raw: String): FmTemporal = {
    val dateOnly = "^([0-9]{4})-([0-9]{1,2})-([0-9]{1,2})$".r
    raw.trim match {
      case dateOnly(y, m, d) =>
        val ld = java.time.LocalDate.of(y.toInt, m.toInt, d.toInt)
        FmTemporal(
          f"${ld.getYear}%04d-${ld.getMonthValue}%02d-${ld.getDayOfMonth}%02d",
          isDateOnly = true,
          ld.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
      case other =>
        // Full timestamp. Parse offset-bearing and naive forms correctly
        // so FmTemporal comparisons (mutations' sort/remove) order by real
        // instants; the text form stays Python-style (space separator).
        val iso = other.replace(" ", "T").replace("t", "T")
        val epoch: Long =
          try java.time.OffsetDateTime.parse(iso).toInstant.toEpochMilli
          catch {
            case _: Exception =>
              try java.time.LocalDateTime.parse(iso)
                .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
              catch {
                case _: Exception =>
                  try java.time.Instant.parse(iso).toEpochMilli
                  catch { case _: Exception => 0L }
              }
          }
        val t = other.replace("T", " ").replace("t", " ").stripSuffix("Z")
        FmTemporal(t, isDateOnly = false, epoch)
    }
  }

  private val jsonBoundary: Regex = "(?m)^(?:\\{|\\})$".r
  private val tomlBoundary: Regex = "(?m)^\\+{3,}[ \t\f\r]*$".r

  /** python-frontmatter `parse`: returns (metadata, content). Handler
    * detection mirrors the library's default handler set: `---` fences →
    * YAML, a `{` line → JSON ({ and } alone on lines), `+++` fences →
    * TOML (active in the reference's runtime via stdlib tomllib).
    */
  def parse(text: String): Post = {
    val t = text.strip()
    val empty = new ju.LinkedHashMap[String, Any]()
    if (t.startsWith("---")) parseFenced(t, boundary, yamlLoad, Post.Yaml)
    else if (t.startsWith("{")) parseFenced(t, jsonBoundary, jsonLoad, Post.Json)
    else if (t.startsWith("+++")) parseFenced(t, tomlBoundary, tomlLoad, Post.Toml)
    else Post(empty, t)
  }

  private def parseFenced(
      t: String, fence: Regex, load: String => Any, handler: String): Post = {
    val empty = new ju.LinkedHashMap[String, Any]()
    val ms = fence.findAllMatchIn(t).take(2).toList
    if (ms.length < 2 || ms.head.start != 0) return Post(empty, t)
    val fmBlock = t.substring(ms.head.end, ms(1).start)
    val content = t.substring(ms(1).end).strip()
    load(fmBlock) match {
      case m: ju.Map[_, _] =>
        val lm = new ju.LinkedHashMap[String, Any]()
        m.forEach((k, v) => lm.put(String.valueOf(k), v))
        Post(lm, content, handler)
      case _ => Post(empty, content, handler)
    }
  }

  private def yamlLoad(block: String): Any = newYaml().load[AnyRef](block)

  /** JSON frontmatter: the `{`/`}` fence lines ARE the braces, so the
    * inner block is re-wrapped before loading (python-frontmatter's
    * `json.loads("{" + fm + "}")`); parsed with the same safe loader
    * since JSON is a subset of YAML flow syntax → identical value types.
    */
  private def jsonLoad(block: String): Any = newYaml().load[AnyRef]("{" + block + "}")

  private def tomlLoad(block: String): Any = Toml.parse(block)

  /** python-frontmatter dump: serializes with the handler detected at load
    * time (`frontmatter.dump` keeps `post.handler`; reference
    * `files.py:142-145`), so mutations never convert a file's frontmatter
    * format. YAML: `---` fences, block style, sorted keys, unicode allowed
    * (PyYAML safe_dump defaults). JSON: bare-brace fences, 4-space indent,
    * sorted keys (json.dumps with JSONHandler's defaults). TOML: `+++`
    * fences, insertion order, scalars before `[table]` sections.
    */
  def dumps(post: Post): String = post.handler match {
    case Post.Json => dumpsJson(post)
    case Post.Toml => dumpsToml(post)
    case _         => dumpsYaml(post)
  }

  private def dumpsYaml(post: Post): String = {
    val opts = new DumperOptions
    opts.setDefaultFlowStyle(DumperOptions.FlowStyle.BLOCK)
    opts.setAllowUnicode(true)
    val repr = new Representer(opts) {
      representers.put(classOf[FmTemporal], (data: Object) => {
        val t = data.asInstanceOf[FmTemporal]
        representScalar(Tag.TIMESTAMP, t.pyText)
      })
    }
    val sorted = new ju.TreeMap[String, Any](post.metadata)
    val yamlText =
      if (sorted.isEmpty) ""
      else new Yaml(repr, opts).dump(sorted).strip()
    s"---\n$yamlText\n---\n\n${post.content}\n"
  }

  /** JSON handler dump: the outer braces alone on their own lines ARE the
    * fences (matching `jsonBoundary` on re-parse), body after a blank line.
    * Mirrors json.dumps(indent=4, sort_keys=True): nested containers
    * multi-line at +4 indent, so no inner brace ever sits alone at column 0.
    */
  private def dumpsJson(post: Post): String = {
    val sorted = new ju.TreeMap[String, Any](post.metadata)
    val sb = new StringBuilder
    jsonObjectBody(sorted, sb, indent = 0)
    s"${sb.toString}\n\n${post.content}\n"
  }

  private def jsonObjectBody(m: ju.Map[String, Any], sb: StringBuilder, indent: Int): Unit = {
    if (m.isEmpty) { sb ++= "{}"; return }
    val pad = " " * (indent + 4)
    sb ++= "{\n"
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      sb ++= pad
      jsonString(e.getKey, sb)
      sb ++= ": "
      jsonValue(e.getValue, sb, indent + 4)
      if (it.hasNext) sb += ','
      sb += '\n'
    }
    sb ++= " " * indent
    sb += '}'
  }

  private def jsonValue(v: Any, sb: StringBuilder, indent: Int): Unit = v match {
    case null                 => sb ++= "null"
    case b: java.lang.Boolean => sb ++= (if (b) "true" else "false")
    case s: String            => jsonString(s, sb)
    case t: FmTemporal        => jsonString(t.pyText, sb)
    case n: java.lang.Number  => sb ++= n.toString
    case l: ju.List[_] =>
      if (l.isEmpty) sb ++= "[]"
      else {
        val pad = " " * (indent + 4)
        sb ++= "[\n"
        val it = l.iterator()
        while (it.hasNext) {
          sb ++= pad
          jsonValue(it.next(), sb, indent + 4)
          if (it.hasNext) sb += ','
          sb += '\n'
        }
        sb ++= " " * indent
        sb += ']'
      }
    case m: ju.Map[_, _] =>
      val lm = new ju.LinkedHashMap[String, Any]()
      m.forEach((k, vv) => lm.put(String.valueOf(k), vv))
      jsonObjectBody(lm, sb, indent)
    case other => jsonString(String.valueOf(other), sb)
  }

  private def jsonString(s: String, sb: StringBuilder): Unit = {
    sb += '"'
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"'            => sb ++= "\\\""
        case '\\'           => sb ++= "\\\\"
        case '\n'           => sb ++= "\\n"
        case '\r'           => sb ++= "\\r"
        case '\t'           => sb ++= "\\t"
        case c if c < 0x20  => sb ++= f"\\u${c.toInt}%04x"
        case c              => sb += c
      }
      i += 1
    }
    sb += '"'
  }

  /** TOML handler dump: `+++` fences, insertion order preserved, root
    * scalars/arrays emitted before `[table]` sections (toml.dumps shape).
    * Restricted to the subset [[Toml.parse]] accepts — one table level,
    * single-line arrays — so every dump round-trips; anything outside
    * (nulls, deeper nesting) throws and lands in the mutation warning
    * channel, the same path python's toml raises through.
    */
  private def dumpsToml(post: Post): String = {
    val sb = new StringBuilder
    val tables = new ju.LinkedHashMap[String, ju.Map[_, _]]()
    post.metadata.forEach { (k, v) =>
      v match {
        case m: ju.Map[_, _] => tables.put(k, m)
        case _ =>
          sb ++= tomlKey(k); sb ++= " = "; tomlValue(v, sb); sb += '\n'
      }
    }
    tables.forEach { (k, m) =>
      sb += '['; sb ++= tomlKey(k); sb ++= "]\n"
      m.asInstanceOf[ju.Map[AnyRef, Any]].forEach { (mk, mv) =>
        sb ++= tomlKey(String.valueOf(mk)); sb ++= " = "; tomlValue(mv, sb); sb += '\n'
      }
    }
    s"+++\n${sb.toString.stripTrailing()}\n+++\n\n${post.content}\n"
  }

  private def tomlKey(k: String): String =
    if (k.nonEmpty && k.forall(c => c.isLetterOrDigit || c == '_' || c == '-')) k
    else "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def tomlValue(v: Any, sb: StringBuilder): Unit = v match {
    case b: java.lang.Boolean => sb ++= (if (b) "true" else "false")
    case s: String =>
      sb += '"'
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '"'           => sb ++= "\\\""
          case '\\'          => sb ++= "\\\\"
          case '\n'          => sb ++= "\\n"
          case '\r'          => sb ++= "\\r"
          case '\t'          => sb ++= "\\t"
          case c if c < 0x20 => sb ++= f"\\u${c.toInt}%04x"
          case c             => sb += c
        }
        i += 1
      }
      sb += '"'
    case t: FmTemporal        => sb ++= t.pyText.replace(" ", "T")
    case n: java.lang.Number  => sb ++= n.toString
    case l: ju.List[_] =>
      sb += '['
      val it = l.iterator()
      while (it.hasNext) {
        tomlValue(it.next(), sb)
        if (it.hasNext) sb ++= ", "
      }
      sb += ']'
    case null =>
      throw new IllegalArgumentException("TOML cannot represent null")
    case other =>
      throw new IllegalArgumentException(
        s"unsupported TOML value type: ${other.getClass.getName}")
  }

  def load(path: java.nio.file.Path): Post =
    parse(new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))

  def dump(post: Post, path: java.nio.file.Path): Unit =
    java.nio.file.Files.write(path, dumps(post).getBytes("UTF-8"))
}
