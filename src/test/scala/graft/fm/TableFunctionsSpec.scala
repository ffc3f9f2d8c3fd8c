package graft.fm

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DuckDB file-reading table functions through the full engine path —
  * every semantic here was probed against native DuckDB 1.0.0 before
  * being pinned (header sniffing, columns= typing, skip-per-file,
  * filename spelling, json array-vs-ndjson detection, glob output).
  */
class TableFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus(files: (String, String)*): Path = {
    val dir = Files.createTempDirectory("graft_tf_spec")
    files.foreach { case (rel, content) =>
      val p = dir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes("UTF-8"))
    }
    dir
  }

  private def eng(dir: Path) =
    new QueryEngine(spark, Settings(dir.toString, enableSemantic = false, "", None))

  private val oneDoc = Seq("a.md" -> "---\ntitle: Alpha\n---\nbody")

  // ---- parser -------------------------------------------------------------

  test("parseCall: path list, named args, columns struct") {
    val c = TableFunctions.parseCall("read_csv",
      "['a.csv', 'b.csv'], header = true, delim='|', " +
        "columns={'id': 'BIGINT', 'name': 'VARCHAR'}")
    assert(c.rawPaths == Seq("a.csv", "b.csv"))
    assert(c.opts == Map("header" -> "true", "delim" -> "|"))
    assert(c.columns.get == Seq("id" -> "BIGINT", "name" -> "VARCHAR"))
  }

  test("rewrite only touches FROM-position calls") {
    var calls = List.empty[String]
    val out = TableFunctions.rewrite(
      "SELECT glob('x') FROM read_csv('f.csv') WHERE a = 'read_json(''y'')'",
      c => { calls ::= c.fn; "v1" })
    assert(out == "SELECT glob('x') FROM v1 WHERE a = 'read_json(''y'')'")
    assert(calls == List("read_csv"))
  }

  // ---- csv ----------------------------------------------------------------

  test("read_csv auto: header + type inference, aggregates match") {
    val dir = corpus(oneDoc :+
      ("data.csv" -> "doc_id,lang,n\n1,en,10\n2,fr,20\n3,en,30\n"): _*)
    val e = eng(dir)
    val r = e.query("**/*.md",
      "SELECT lang, COUNT(*) AS c, SUM(n) AS s FROM read_csv('data.csv') " +
        "GROUP BY lang ORDER BY lang").results.collect()
    assert(r.map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq(("en", 2L, 40L), ("fr", 1L, 20L)))
  }

  test("read_csv columns= with headered file sniffs and skips the header") {
    val dir = corpus(oneDoc :+ ("h.csv" -> "id,name\n1,a\n2,b\n"): _*)
    val r = eng(dir).query("**/*.md",
      "SELECT id, name FROM read_csv('h.csv', " +
        "columns={'id': 'BIGINT', 'name': 'VARCHAR'}) ORDER BY id")
      .results.collect()
    assert(r.map(x => (x.getLong(0), x.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("read_csv columns= with headerless file reads from row one") {
    val dir = corpus(oneDoc :+ ("nh.csv" -> "1|a\n2|b\n"): _*)
    val r = eng(dir).query("**/*.md",
      "SELECT id, name FROM read_csv('nh.csv', delim='|', " +
        "columns={'id': 'BIGINT', 'name': 'VARCHAR'}) ORDER BY id")
      .results.collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("read_csv skip drops leading lines per file, then the header") {
    val dir = corpus(oneDoc :+
      ("s.csv" -> "junk line\nid,v\n1,x\n2,y\n"): _*)
    val r = eng(dir).query("**/*.md",
      "SELECT id, v FROM read_csv('s.csv', skip=1) ORDER BY id")
      .results.collect()
    assert(r.map(x => (x.getInt(0), x.getString(1))).toSeq ==
      Seq((1, "x"), (2, "y")))
  }

  test("read_csv nullstr and empty-field nulls") {
    val dir = corpus(oneDoc :+ ("n.csv" -> "a,b\n1,NA\n2,x\n3,\n"): _*)
    val r = eng(dir).query("**/*.md",
      "SELECT a, b FROM read_csv('n.csv', nullstr='NA', " +
        "columns={'a': 'BIGINT', 'b': 'VARCHAR'}) ORDER BY a")
      .results.collect()
    assert(r.map(x => (x.getLong(0), x.getString(1))).toSeq ==
      Seq((1L, null), (2L, "x"), (3L, null)))
  }

  test("read_csv filename=true spells relative paths relatively") {
    val dir = corpus(oneDoc ++ Seq(
      "d/p.csv" -> "i\n1\n", "d/q.csv" -> "i\n2\n"): _*)
    val r = eng(dir).query("**/*.md",
      "SELECT i, filename FROM read_csv('d/*.csv', filename=true) ORDER BY i")
      .results.collect()
    assert(r.map(x => (x.getInt(0), x.getString(1))).toSeq ==
      Seq((1, "d/p.csv"), (2, "d/q.csv")))
  }

  test("malformed csv fails loudly; ignore_errors drops the bad row") {
    val dir = corpus(oneDoc :+ ("m.csv" -> "a,b\n1,x\nnot_an_int,y\n"): _*)
    val e = eng(dir)
    val strict = intercept[Exception] {
      e.query("**/*.md",
        "SELECT a FROM read_csv('m.csv', columns={'a': 'BIGINT', 'b': 'VARCHAR'}, header=true) ORDER BY a")
        .results.collect()
    }
    assert(strict != null)
    val r = e.query("**/*.md",
      "SELECT a FROM read_csv('m.csv', columns={'a': 'BIGINT', 'b': 'VARCHAR'}, " +
        "header=true, ignore_errors=true) ORDER BY a").results.collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L))
  }

  // ---- json ---------------------------------------------------------------

  test("read_json: ndjson and array files both work (format sniffed)") {
    val dir = corpus(oneDoc ++ Seq(
      "nd.json" -> "{\"a\":1,\"b\":\"x\"}\n{\"a\":2,\"b\":\"y\"}\n",
      "arr.json" -> "[{\"a\":3,\"b\":\"z\"},{\"a\":4,\"b\":\"w\"}]"): _*)
    val e = eng(dir)
    val nd = e.query("**/*.md",
      "SELECT a, b FROM read_json('nd.json') ORDER BY a").results.collect()
    assert(nd.map(x => (x.getLong(0), x.getString(1))).toSeq ==
      Seq((1L, "x"), (2L, "y")))
    val arr = e.query("**/*.md",
      "SELECT a, b FROM read_json_auto('arr.json') ORDER BY a").results.collect()
    assert(arr.map(_.getLong(0)).toSeq == Seq(3L, 4L))
  }

  // ---- parquet ------------------------------------------------------------

  test("read_parquet: list of files, and glob; parquet_scan alias") {
    val dir = corpus(oneDoc: _*)
    import spark.implicits._
    Seq((1L, "a")).toDF("i", "s").coalesce(1)
      .write.parquet(dir.resolve("pq1").toString)
    Seq((2L, "b")).toDF("i", "s").coalesce(1)
      .write.parquet(dir.resolve("pq2").toString)
    val e = eng(dir)
    val r = e.query("**/*.md",
      "SELECT i, s FROM read_parquet(['pq1/*.parquet', 'pq2/*.parquet']) ORDER BY i")
      .results.collect()
    assert(r.map(x => (x.getLong(0), x.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    val r2 = e.query("**/*.md",
      "SELECT count(*) AS n FROM parquet_scan('pq1/*.parquet')").results.collect()
    assert(r2.head.getLong(0) == 1L)
  }

  // ---- glob ---------------------------------------------------------------

  test("glob() lists matches sorted, in the call's spelling") {
    val dir = corpus(oneDoc ++ Seq(
      "x/one.csv" -> "a\n1\n", "x/two.csv" -> "a\n2\n", "x/three.txt" -> ""): _*)
    val r = eng(dir).query("**/*.md",
      "SELECT file FROM glob('x/*.csv') ORDER BY file").results.collect()
    assert(r.map(_.getString(0)).toSeq == Seq("x/one.csv", "x/two.csv"))
    // no matches → empty, not an error (DuckDB glob behavior)
    val empty = eng(dir).query("**/*.md",
      "SELECT file FROM glob('nope/*.csv')").results.collect()
    assert(empty.isEmpty)
  }

  // ---- engine integration -------------------------------------------------

  test("joins against the files view; works inside CTEs and CTAS") {
    val dir = corpus(oneDoc :+ ("meta.csv" -> "path,owner\na.md,kai\n"): _*)
    val e = eng(dir)
    val j = e.query("**/*.md",
      """WITH m AS (SELECT * FROM read_csv('meta.csv'))
        |SELECT f.path, m.owner FROM files f JOIN m ON f.path = m.path""".stripMargin)
      .results.collect()
    assert(j.map(x => (x.getString(0), x.getString(1))).toSeq == Seq(("a.md", "kai")))
    val c = e.query("**/*.md",
      "CREATE TABLE own AS SELECT * FROM read_csv('meta.csv'); " +
        "SELECT owner FROM own").results.collect()
    assert(c.map(_.getString(0)).toSeq == Seq("kai"))
  }

  test("file change invalidates the memoized view (mtime fingerprint)") {
    val dir = corpus(oneDoc :+ ("v.csv" -> "a\n1\n"): _*)
    val e = eng(dir)
    def count(): Long = e.query("**/*.md",
      "SELECT count(*) AS n FROM read_csv('v.csv')").results.collect().head.getLong(0)
    assert(count() == 1L)
    Thread.sleep(5) // distinct mtime granularity guard
    Files.write(dir.resolve("v.csv"), "a\n1\n2\n3\n".getBytes("UTF-8"))
    assert(count() == 3L)
  }

  test("COPY TO then read back through read_csv round-trips") {
    val dir = corpus(oneDoc: _*)
    val e = eng(dir)
    e.query("**/*.md",
      "COPY (SELECT path, title FROM files) TO 'out.csv'")
    val r = e.query("**/*.md",
      "SELECT path, title FROM read_csv('out.csv') ORDER BY path")
      .results.collect()
    assert(r.map(x => (x.getString(0), x.getString(1))).toSeq ==
      Seq(("a.md", "Alpha")))
  }

  test("relative paths cannot escape the base dir; missing file is loud") {
    val dir = corpus(oneDoc: _*)
    val e = eng(dir)
    intercept[Exception] {
      e.query("**/*.md", "SELECT * FROM read_csv('../../etc/passwd')")
    }
    intercept[Exception] {
      e.query("**/*.md", "SELECT * FROM read_csv('missing.csv')")
    }
  }
}
