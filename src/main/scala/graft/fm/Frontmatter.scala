package graft.fm

import java.{util => ju}
import scala.util.matching.Regex

import org.yaml.snakeyaml.{DumperOptions, LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor
import org.yaml.snakeyaml.nodes.{Node, ScalarNode, Tag}
import org.yaml.snakeyaml.representer.Representer

/** A parsed Markdown document: YAML frontmatter mapping + body.
  * Mirrors python-frontmatter's `Post` (metadata, content).
  */
final case class Post(metadata: ju.LinkedHashMap[String, Any], content: String)

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
    if (t.startsWith("---")) parseFenced(t, boundary, yamlLoad)
    else if (t.startsWith("{")) parseFenced(t, jsonBoundary, jsonLoad)
    else if (t.startsWith("+++")) parseFenced(t, tomlBoundary, tomlLoad)
    else Post(empty, t)
  }

  private def parseFenced(
      t: String, fence: Regex, load: String => Any): Post = {
    val empty = new ju.LinkedHashMap[String, Any]()
    val ms = fence.findAllMatchIn(t).take(2).toList
    if (ms.length < 2 || ms.head.start != 0) return Post(empty, t)
    val fmBlock = t.substring(ms.head.end, ms(1).start)
    val content = t.substring(ms(1).end).strip()
    load(fmBlock) match {
      case m: ju.Map[_, _] =>
        val lm = new ju.LinkedHashMap[String, Any]()
        m.forEach((k, v) => lm.put(String.valueOf(k), v))
        Post(lm, content)
      case _ => Post(empty, content)
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

  /** python-frontmatter dump: `---\n<yaml>\n---\n\n<content>\n` with block
    * style, sorted keys, unicode allowed (PyYAML safe_dump defaults).
    */
  def dumps(post: Post): String = {
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

  def load(path: java.nio.file.Path): Post =
    parse(new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))

  def dump(post: Post, path: java.nio.file.Path): Unit =
    java.nio.file.Files.write(path, dumps(post).getBytes("UTF-8"))
}
