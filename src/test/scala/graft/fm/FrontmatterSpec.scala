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

  test("dump/parse round trip preserves metadata and body") {
    val src = Frontmatter.parse("---\ntitle: T\nn: 3\ntags:\n- x\n- y\n---\n\nThe body\n")
    val dumped = Frontmatter.dumps(src)
    val back = Frontmatter.parse(dumped)
    assert(back.metadata.asScala.toMap == src.metadata.asScala.toMap)
    assert(back.content == src.content)
  }
}
