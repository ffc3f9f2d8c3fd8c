package graft.fm

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the batch_* semantics matrices from the reference's
  * tests/test_server.py (skip vs warn vs create rules, first-occurrence
  * remove/replace, already-sorted and no-dup skips, TypeError warning).
  */
class MutationsSpec extends AnyFunSuite {

  private def corpus(files: (String, String)*): Path = {
    val dir = Files.createTempDirectory("graft_mut_spec")
    files.foreach { case (rel, content) =>
      val p = dir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes("UTF-8"))
    }
    dir
  }

  private def read(dir: Path, rel: String): Post = Frontmatter.load(dir.resolve(rel))
  private def tags(dir: Path, rel: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    read(dir, rel).metadata.get("tags").asInstanceOf[java.util.List[_]]
      .asScala.map(String.valueOf).toSeq
  }

  test("update: set + unset, unset wins on conflict (server.py:237-263)") {
    val dir = corpus("a.md" -> "---\nkeep: 1\ndrop: 2\n---\nbody")
    val r = Mutations.update(dir, "a.md",
      setValues = Map("new" -> "x", "drop" -> "resurrect"), unset = Seq("drop"))
    assert(r.frontmatter == Map("keep" -> 1, "new" -> "x"))
    val post = read(dir, "a.md")
    assert(post.content == "body")
    assert(!post.metadata.containsKey("drop"))
  }

  test("update creates frontmatter when absent; body preserved (files.py:110-150)") {
    val dir = corpus("plain.md" -> "just text\nmore text")
    Mutations.update(dir, "plain.md", setValues = Map("status" -> "new"))
    val post = read(dir, "plain.md")
    assert(post.metadata.get("status") == "new")
    assert(post.content == "just text\nmore text")
  }

  test("update: path escape and missing file raise (server.py:60-84)") {
    val dir = corpus("a.md" -> "x")
    intercept[IllegalArgumentException](Mutations.update(dir, "../evil.md", Map("a" -> 1)))
    intercept[java.io.FileNotFoundException](Mutations.update(dir, "nope.md", Map("a" -> 1)))
  }

  test("update: null, empty-string, and array values (test_files.py set_* cases)") {
    val dir = corpus("a.md" -> "---\nkeep: 1\n---\nbody")
    val arr = new java.util.ArrayList[Any]()
    arr.add("x"); arr.add("y")
    val r = Mutations.update(dir, "a.md",
      setValues = Map("nothing" -> null, "empty" -> "", "list" -> arr))
    assert(r.frontmatter("nothing") == null)
    assert(r.frontmatter("empty") == "")
    val post = read(dir, "a.md")
    assert(post.metadata.get("nothing") == null)
    assert(post.metadata.get("empty") == "")
    assert(post.metadata.get("list").isInstanceOf[java.util.List[_]])
    assert(post.content == "body")
    // null-valued key serializes to NULL in the files table
    assert(PyValue.serialize(post.metadata.get("nothing")) == null)
  }

  test("update with no changes does not rewrite the file (files.py:141-145)") {
    val dir = corpus("a.md" -> "---\nkeep: 1\n---\nbody")
    val f = dir.resolve("a.md")
    val mtime = Files.getLastModifiedTime(f)
    val before = Files.readAllBytes(f).toSeq
    val r = Mutations.update(dir, "a.md")
    assert(r.frontmatter == Map("keep" -> 1))
    assert(Files.getLastModifiedTime(f) == mtime)
    assert(Files.readAllBytes(f).toSeq == before)
  }

  test("batch over a non-matching glob returns empty result, no warnings") {
    val dir = corpus("a.md" -> "---\nx: 1\n---\n")
    val r = Mutations.batchUpdate(dir, "nomatch/**/*.md", Map("y" -> 2))
    assert(r == Mutations.BatchResult(0, Nil, Nil))
  }

  test("batch_update applies to all matches, errors become warnings") {
    val dir = corpus(
      "a.md" -> "---\nx: 1\n---\n", "sub/b.md" -> "no frontmatter here")
    val r = Mutations.batchUpdate(dir, "**/*.md", Map("touched" -> true))
    assert(r.updatedCount == 2)
    assert(r.updatedFiles == Seq("a.md", "sub/b.md"))
    assert(read(dir, "sub/b.md").metadata.get("touched") == java.lang.Boolean.TRUE)
  }

  test("batch_update preserves frontmatter format: TOML stays +++, JSON stays braces") {
    val dir = corpus(
      "t.md" -> "+++\ntitle = \"T\"\ntags = [\"x\"]\n+++\n\ntoml body\n",
      "j.md" -> "{\n\"title\": \"J\",\n\"n\": 3\n}\n\njson body\n",
      "y.md" -> "---\ntitle: Y\n---\n\nyaml body\n")
    val r = Mutations.batchUpdate(dir, "*.md", Map("touched" -> true))
    assert(r.updatedCount == 3)
    val tomlText = new String(Files.readAllBytes(dir.resolve("t.md")), "UTF-8")
    assert(tomlText.startsWith("+++\n"), tomlText)
    assert(tomlText.contains("touched = true"))
    val jsonText = new String(Files.readAllBytes(dir.resolve("j.md")), "UTF-8")
    assert(jsonText.startsWith("{\n"), jsonText)
    assert(jsonText.contains("\"touched\": true"))
    val yamlText = new String(Files.readAllBytes(dir.resolve("y.md")), "UTF-8")
    assert(yamlText.startsWith("---\n"), yamlText)
    // values and bodies survive the format-preserving rewrite
    assert(read(dir, "t.md").metadata.get("title") == "T")
    assert(read(dir, "t.md").content == "toml body")
    assert(read(dir, "j.md").metadata.get("n") == Integer.valueOf(3))
    assert(read(dir, "j.md").content == "json body")
  }

  test("batch_array_add: create/skip-dup/append/warn matrix (server.py:311-377)") {
    val dir = corpus(
      "create.md" -> "---\ntitle: t\n---\n",
      "dup.md" -> "---\ntags:\n- x\n---\n",
      "append.md" -> "---\ntags:\n- a\n---\n",
      "notarray.md" -> "---\ntags: scalar\n---\n")
    val r = Mutations.batchArrayAdd(dir, "*.md", "tags", "x")
    assert(r.updatedFiles == Seq("append.md", "create.md"))
    assert(tags(dir, "create.md") == Seq("x"))
    assert(tags(dir, "append.md") == Seq("a", "x"))
    assert(tags(dir, "dup.md") == Seq("x")) // duplicate skipped
    assert(r.warnings == Seq("Skipped notarray.md: 'tags' is not an array"))
    // allow_duplicates appends anyway
    val r2 = Mutations.batchArrayAdd(dir, "dup.md", "tags", "x", allowDuplicates = true)
    assert(r2.updatedFiles == Seq("dup.md"))
    assert(tags(dir, "dup.md") == Seq("x", "x"))
  }

  test("batch_array_add: array value appended as single element (server.py:369-372)") {
    val dir = corpus("a.md" -> "---\ntags:\n- x\n---\n")
    val nested = new java.util.ArrayList[Any]()
    nested.add("n1"); nested.add("n2")
    Mutations.batchArrayAdd(dir, "a.md", "tags", nested)
    val post = read(dir, "a.md")
    val l = post.metadata.get("tags").asInstanceOf[java.util.List[_]]
    assert(l.size == 2)
    assert(l.get(1).isInstanceOf[java.util.List[_]])
    // nested arrays survive as nested JSON (tests/test_server.py:331-339)
    assert(PyValue.serialize(l) == "[\"x\", [\"n1\", \"n2\"]]")
  }

  test("batch_array_remove: first occurrence only; skip matrix (server.py:380-442)") {
    val dir = corpus(
      "two.md" -> "---\ntags:\n- x\n- y\n- x\n---\n",
      "none.md" -> "---\ntitle: t\n---\n",
      "missingval.md" -> "---\ntags:\n- z\n---\n",
      "notarray.md" -> "---\ntags: 5\n---\n")
    val r = Mutations.batchArrayRemove(dir, "*.md", "tags", "x")
    assert(r.updatedFiles == Seq("two.md"))
    assert(tags(dir, "two.md") == Seq("y", "x")) // only first removed
    assert(r.warnings == Seq("Skipped notarray.md: 'tags' is not an array"))
  }

  test("batch_array_replace: first occurrence only (server.py:501-505)") {
    val dir = corpus("a.md" -> "---\ntags:\n- x\n- y\n- x\n---\n")
    val r = Mutations.batchArrayReplace(dir, "a.md", "tags", "x", "z")
    assert(r.updatedFiles == Seq("a.md"))
    assert(tags(dir, "a.md") == Seq("z", "y", "x"))
    // old value absent: skip silently
    val r2 = Mutations.batchArrayReplace(dir, "a.md", "tags", "nope", "w")
    assert(r2.updatedCount == 0 && r2.warnings.isEmpty)
  }

  test("batch_array_sort: sort/skip-sorted/skip-small/reverse/TypeError (server.py:513-588)") {
    val dir = corpus(
      "unsorted.md" -> "---\ntags:\n- c\n- a\n- b\n---\n",
      "sorted.md" -> "---\ntags:\n- a\n- b\n---\n",
      "single.md" -> "---\ntags:\n- only\n---\n",
      "mixed.md" -> "---\ntags:\n- 1\n- two\n---\n")
    val r = Mutations.batchArraySort(dir, "*.md", "tags")
    assert(r.updatedFiles == Seq("unsorted.md"))
    assert(tags(dir, "unsorted.md") == Seq("a", "b", "c"))
    assert(r.warnings.length == 1 && r.warnings.head.startsWith("Failed to update mixed.md"))
    val r2 = Mutations.batchArraySort(dir, "sorted.md", "tags", reverse = true)
    assert(r2.updatedFiles == Seq("sorted.md"))
    assert(tags(dir, "sorted.md") == Seq("b", "a"))
  }

  test("batch_array_sort: numeric cross-type ordering like Python") {
    val dir = corpus("n.md" -> "---\nnums:\n- 3.5\n- 1\n- true\n- 2\n---\n")
    Mutations.batchArraySort(dir, "n.md", "nums")
    import scala.jdk.CollectionConverters._
    val post = read(dir, "n.md")
    val vals = post.metadata.get("nums").asInstanceOf[java.util.List[_]].asScala.toSeq
    // Python sorted([3.5, 1, True, 2]) == [1, True, 2, 3.5] (stable; True == 1)
    assert(vals.map(PyValue.pyStr) == Seq("1", "True", "2", "3.5"))
  }

  test("batch_array_unique: first-occurrence order; skip no-dups (server.py:591-660)") {
    val dir = corpus(
      "dups.md" -> "---\ntags:\n- b\n- a\n- b\n- c\n- a\n---\n",
      "nodups.md" -> "---\ntags:\n- x\n- y\n---\n")
    val r = Mutations.batchArrayUnique(dir, "*.md", "tags")
    assert(r.updatedFiles == Seq("dups.md"))
    assert(tags(dir, "dups.md") == Seq("b", "a", "c"))
  }

  test("distributed batch_update matches driver-side semantics") {
    val dir = corpus("a.md" -> "---\nx: 1\n---\n", "b.md" -> "plain")
    val r = Mutations.batchUpdateDistributed(
      graft.TestSpark.spark, dir, "*.md", Map("done" -> true))
    assert(r.updatedCount == 2)
    assert(!r.listTruncated)
    assert(read(dir, "a.md").metadata.get("done") == java.lang.Boolean.TRUE)
    assert(read(dir, "b.md").metadata.get("done") == java.lang.Boolean.TRUE)
  }

  test("distributed batch_update bounds driver lists above the cap, exact counts always") {
    val files = (0 until 7).map(i => f"f$i%02d.md" -> s"---\nx: $i\n---\n")
    val dir = corpus(files: _*)
    // Below the cap: full sorted list, reference parity, no flag.
    val full = Mutations.batchUpdateDistributed(
      graft.TestSpark.spark, dir, "*.md", Map("done" -> true), maxListed = 7)
    assert(full.updatedCount == 7 && !full.listTruncated)
    assert(full.updatedFiles == files.map(_._1))
    // Above the cap: exact count, first N paths in sorted order, flag set.
    val capped = Mutations.batchUpdateDistributed(
      graft.TestSpark.spark, dir, "*.md", Map("done2" -> true), maxListed = 3)
    assert(capped.updatedCount == 7)
    assert(capped.listTruncated)
    assert(capped.updatedFiles == files.map(_._1).take(3))
    // Every file was still actually rewritten despite the bounded listing.
    files.foreach { case (f, _) =>
      assert(read(dir, f).metadata.get("done2") == java.lang.Boolean.TRUE, f)
    }
  }
}
