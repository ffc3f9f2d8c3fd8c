package graft.fm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Tool-facade integration: response shapes + conditional semantic
  * registration (reference tests/test_server.py end-to-end layer).
  */
class FmToolsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkTools(semantic: Boolean) = {
    val dir = Files.createTempDirectory("graft_tools_spec")
    Files.write(dir.resolve("a.md"), "---\ntitle: A\ntags:\n- x\n---\nbody words here".getBytes)
    Files.write(dir.resolve("b.md"), "---\ntitle: B\n---\nmore body".getBytes)
    new FmTools(spark, Settings(dir.toString, semantic, "m",
      Some(Files.createTempDirectory("graft_tools_cache").toString)))
  }

  test("query returns {results, row_count, columns}") {
    val tools = mkTools(semantic = false)
    val resp = tools.query("**/*.md", "SELECT path, title FROM files ORDER BY path")
    assert(resp("row_count") == 2)
    assert(resp("columns") == Seq("path", "title"))
    val rows = resp("results").asInstanceOf[Seq[Map[String, Any]]]
    assert(rows.head("title") == "A")
  }

  test("query_inspect returns file_count + schema map") {
    val tools = mkTools(semantic = false)
    val resp = tools.queryInspect("**/*.md")
    assert(resp("file_count") == 2L)
    val schema = resp("schema").asInstanceOf[Map[String, Map[String, Any]]]
    assert(schema("tags")("type") == "array")
    assert(schema("title")("nullable") == false)
  }

  test("batch tools return {updated_count, updated_files}") {
    val tools = mkTools(semantic = false)
    val resp = tools.batchArrayAdd("**/*.md", "tags", "new")
    assert(resp("updated_count") == 2)
    assert(resp("updated_files") == Seq("a.md", "b.md"))
  }

  test("semantic tools hidden unless enabled (server.py:663-675)") {
    val off = mkTools(semantic = false)
    intercept[IllegalStateException](off.indexStatus())
    val on = mkTools(semantic = true)
    assert(on.indexStatus()("state") == "idle")
    on.startup()
    assert(on.indexWait(60000)("success") == true)
    assert(on.indexStatus()("state") == "ready")
    // after indexing, the engine query sees embeddings
    val r = on.query("**/*.md",
      "SELECT path FROM files WHERE embedding IS NOT NULL ORDER BY path")
    assert(r("row_count") == 2)
  }
}
