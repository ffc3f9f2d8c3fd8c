package graft.fm

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Mirrors python-frontmatter parse semantics exercised by the reference's
  * tests/test_files.py and tests/test_query.py fixtures.
  */
class FrontmatterSpec extends AnyFunSuite {

  test("basic frontmatter + body") {
    val p = Frontmatter.parse("---\ntitle: Hello\ntags:\n- a\n- b\n---\n\nBody text\n")
    assert(p.metadata.get("title") == "Hello")
    assert(p.metadata.get("tags").asInstanceOf[java.util.List[_]].asScala == Seq("a", "b"))
    assert(p.content == "Body text")
  }

  test("no frontmatter: empty metadata, whole text as content") {
    val p = Frontmatter.parse("Just some text\nwith lines\n")
    assert(p.metadata.isEmpty)
    assert(p.content == "Just some text\nwith lines")
  }

  test("single boundary only: treated as content") {
    val p = Frontmatter.parse("---\ntitle: x\nno closing fence")
    assert(p.metadata.isEmpty)
    assert(p.content.startsWith("---"))
  }

  test("later --- lines stay in the body") {
    val p = Frontmatter.parse("---\na: 1\n---\nbody\n---\nmore")
    assert(p.metadata.get("a") == Integer.valueOf(1))
    assert(p.content == "body\n---\nmore")
  }

  test("boundary of 4+ dashes and trailing spaces") {
    val p = Frontmatter.parse("----  \na: 1\n----\nbody")
    assert(p.metadata.get("a") == Integer.valueOf(1))
    assert(p.content == "body")
  }

  test("YAML types: int, float, bool, date, null, templater string") {
    val p = Frontmatter.parse(
      "---\ni: 42\nf: 3.14\nb: true\nd: 2025-11-27\nn:\ns: <% tp.date.now(\"YYYY-MM-DD\") %>\n---\nx")
    assert(p.metadata.get("i") == Integer.valueOf(42))
    assert(p.metadata.get("f") == java.lang.Double.valueOf(3.14))
    assert(p.metadata.get("b") == java.lang.Boolean.TRUE)
    assert(p.metadata.get("d").asInstanceOf[FmTemporal].pyText == "2025-11-27")
    assert(p.metadata.get("n") == null)
    assert(p.metadata.get("s") == "<% tp.date.now(\"YYYY-MM-DD\") %>")
  }

  test("non-mapping frontmatter yields empty metadata") {
    val p = Frontmatter.parse("---\n- just\n- a list\n---\nbody")
    assert(p.metadata.isEmpty)
    assert(p.content == "body")
  }

  test("CRLF line endings parse like LF (boundary allows trailing \\r)") {
    val p = Frontmatter.parse("---\r\ntitle: X\r\ntags:\r\n- a\r\n---\r\nbody line\r\nmore")
    assert(p.metadata.get("title") == "X")
    assert(p.content.startsWith("body line"))
  }

  test("unicode metadata and body survive parse + serialize") {
    val p = Frontmatter.parse("---\ntitle: 日本語タイトル\nemoji: ✨\n---\n本文です\n")
    assert(p.metadata.get("title") == "日本語タイトル")
    assert(PyValue.serialize(p.metadata.get("emoji")) == "✨")
    assert(p.content == "本文です")
  }

  test("JSON frontmatter ({ and } fence lines) parses like python-frontmatter") {
    val p = Frontmatter.parse("{\n\"title\": \"T\",\n\"n\": 3,\n\"tags\": [\"a\", \"b\"]\n}\nThe body")
    assert(p.metadata.get("title") == "T")
    assert(p.metadata.get("n") == Integer.valueOf(3))
    assert(PyValue.serialize(p.metadata.get("tags")) == "[\"a\", \"b\"]")
    assert(p.content == "The body")
  }

  test("TOML frontmatter (+++ fences) parses scalars, arrays, dates, tables") {
    val p = Frontmatter.parse(
      """+++
        |title = "Toml Doc"   # a comment
        |count = 1_000
        |ratio = 2.5
        |draft = false
        |date = 2025-11-27
        |tags = ["x", "y"]
        |[meta]
        |owner = 'ops'
        |+++
        |toml body""".stripMargin)
    assert(p.metadata.get("title") == "Toml Doc")
    assert(p.metadata.get("count") == Integer.valueOf(1000))
    assert(p.metadata.get("ratio") == java.lang.Double.valueOf(2.5))
    assert(p.metadata.get("draft") == java.lang.Boolean.FALSE)
    assert(PyValue.serialize(p.metadata.get("date")) == "2025-11-27")
    assert(PyValue.serialize(p.metadata.get("tags")) == "[\"x\", \"y\"]")
    val meta = p.metadata.get("meta").asInstanceOf[java.util.Map[_, _]]
    assert(meta.get("owner") == "ops")
    assert(p.content == "toml body")
  }

  test("malformed TOML falls back to warning-channel behavior (throws)") {
    intercept[Exception](Toml.parse("not = = valid toml ["))
  }

  test("dump/parse round trip preserves metadata and body") {
    val src = Frontmatter.parse("---\ntitle: T\nn: 3\ntags:\n- x\n- y\n---\n\nThe body\n")
    val dumped = Frontmatter.dumps(src)
    val back = Frontmatter.parse(dumped)
    assert(back.metadata.asScala.toMap == src.metadata.asScala.toMap)
    assert(back.content == src.content)
  }

  test("dump preserves JSON handler: brace fences, round-trips (files.py:142-145)") {
    val src = Frontmatter.parse(
      "{\n\"title\": \"T\",\n\"n\": 3,\n\"ok\": true,\n\"tags\": [\"a\", \"b\"],\n\"meta\": {\"k\": 1}\n}\nThe body")
    assert(src.handler == Post.Json)
    val dumped = Frontmatter.dumps(src)
    assert(dumped.startsWith("{\n"), dumped)
    assert(!dumped.startsWith("---"), dumped)
    val back = Frontmatter.parse(dumped)
    assert(back.handler == Post.Json)
    // JSONHandler dumps with sort_keys=True, so compare order-insensitively
    assert(back.metadata.asScala.toMap == src.metadata.asScala.toMap)
    assert(back.content == src.content)
  }

  test("dump preserves TOML handler: +++ fences, round-trips (files.py:142-145)") {
    val src = Frontmatter.parse(
      """+++
        |title = "T \"quoted\""
        |count = 1000
        |ratio = 2.5
        |draft = false
        |date = 2025-11-27
        |tags = ["x", "y", 3]
        |[meta]
        |owner = 'ops'
        |+++
        |toml body""".stripMargin)
    assert(src.handler == Post.Toml)
    val dumped = Frontmatter.dumps(src)
    assert(dumped.startsWith("+++\n"), dumped)
    val back = Frontmatter.parse(dumped)
    assert(back.handler == Post.Toml)
    assert(PyValue.serialize(back.metadata) == PyValue.serialize(src.metadata))
    assert(back.content == src.content)
  }

  test("TOML dump rejects values outside the parse subset (null) → warning channel") {
    val meta = new java.util.LinkedHashMap[String, Any]()
    meta.put("bad", null)
    intercept[IllegalArgumentException](
      Frontmatter.dumps(Post(meta, "b", Post.Toml)))
  }

  test("dotted TOML table headers throw (nesting unsupported, not flattened)") {
    intercept[IllegalArgumentException](Toml.parse("[a.b]\nk = 1"))
    // but a quoted key containing a dot is a legal single-level table
    val m = Toml.parse("[\"a.b\"]\nk = 1")
    assert(m.get("a.b").asInstanceOf[java.util.Map[_, _]].get("k") == Integer.valueOf(1))
  }
}
