package graft.fm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.semantic.SemanticContext

/** Every SQL example the reference's own README shows to users, run
  * VERBATIM through the engine (README.md:101, 297-300, 306-310,
  * 320-332) — the switch-over test: a frontmatter-mcp user's queries
  * work unchanged.
  */
class ReferenceExamplesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vault() = {
    val dir = Files.createTempDirectory("graft_ref_readme")
    Files.createDirectories(dir.resolve("daily"))
    def w(rel: String, s: String) = Files.write(dir.resolve(rel), s.getBytes("UTF-8"))
    w("daily/2025-11-28.md", "---\ndate: 2025-11-28\ntags: [ai, python]\n---\nfeeling better today, motivation is back")
    w("daily/2025-11-27.md", "---\ndate: 2025-11-27\ntags: [ai]\n---\nslow day, tired")
    w("daily/2025-10-01.md", "---\ndate: 2025-10-01\ntags: [notes]\n---\nold note body")
    w("template.md", "---\ndate: <% tp.date.now(\"YYYY-MM-DD\") %>\ntags: [template]\n---\ntemplate body")
    dir
  }

  test("flagship: SELECT path, date ... WHERE date >= ... ORDER BY date DESC (README.md:101)") {
    val e = new QueryEngine(spark, Settings(vault().toString, false, "", None))
    val r = e.query("**/*.md",
      "SELECT path, date FROM files WHERE date >= '2025-11-01' ORDER BY date DESC")
    val rows = r.results.collect()
    // Templater string '<% ...' sorts after '2025-...' so the template
    // matches the >= filter too — exactly the reference's documented
    // behavior (tests/test_query.py:162-194).
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("template.md", "daily/2025-11-28.md", "daily/2025-11-27.md"))
  }

  test("typed ops: TRY_CAST(date AS DATE) excludes Templater strings (README.md:297-300)") {
    val e = new QueryEngine(spark, Settings(vault().toString, false, "", None))
    val r = e.query("**/*.md",
      "SELECT * FROM files WHERE TRY_CAST(date AS DATE) >= '2025-11-01'")
    assert(r.results.collect().length == 2) // template naturally excluded
  }

  test("arrays: UNNEST(from_json(tags, '[\"\"]')) AS t(tag) (README.md:306-310)") {
    val e = new QueryEngine(spark, Settings(vault().toString, false, "", None))
    val r = e.query("**/*.md",
      """SELECT path, tag
        |FROM files, UNNEST(from_json(tags, '[""]')) AS t(tag)
        |WHERE tag = 'ai'""".stripMargin)
    assert(r.results.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("daily/2025-11-27.md", "daily/2025-11-28.md"))
  }

  test("semantic: 1 - array_cosine_distance(embedding, embed(...)) ranking (README.md:320-332)") {
    val dir = vault()
    val st = Settings(dir.toString, enableSemantic = true, "m",
      Some(Files.createTempDirectory("graft_ref_cache").toString))
    val ctx = new SemanticContext(spark, st, dimOverride = 32)
    ctx.indexer.start(); ctx.indexer.await(60000)
    val e = new QueryEngine(spark, st, Some(ctx))
    val r = e.query("**/*.md",
      """SELECT path, 1 - array_cosine_distance(embedding, embed('feeling better')) as score
        |FROM files
        |ORDER BY score DESC
        |LIMIT 10""".stripMargin)
    val rows = r.results.collect()
    assert(rows.head.getString(0) == "daily/2025-11-28.md") // contains the phrase
    val combined = e.query("**/*.md",
      """SELECT path, date, 1 - array_cosine_distance(embedding, embed('motivation')) as score
        |FROM files
        |WHERE date >= '2025-11-01'
        |ORDER BY score DESC
        |LIMIT 10""".stripMargin)
    assert(combined.results.columns.toSeq == Seq("path", "date", "score"))
    assert(combined.results.collect().head.getString(0) == "daily/2025-11-28.md")
  }
}
