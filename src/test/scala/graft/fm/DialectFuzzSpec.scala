package graft.fm

import org.scalatest.funsuite.AnyFunSuite

import graft.DialectFuzz

/** Static properties of the differential fuzzer's generated statements
  * (the differential run itself — engine vs DuckDB row-hash agreement —
  * is `runMain graft.DialectFuzz` + `tools/oracle_check.py`; see the
  * verify skill). These pin what must hold WITHOUT an oracle: the
  * generator is deterministic (a failing case replays exactly), and
  * every generated statement survives the rewrite pipeline's own
  * invariants — idempotent, balanced, no DuckDB-only syntax left for
  * Spark's parser to trip on.
  */
class DialectFuzzSpec extends AnyFunSuite {

  private val N = 40

  test("generation is deterministic per (family, index)") {
    for (f <- DialectFuzz.familyNames; i <- 0 until N) {
      val a = DialectFuzz.generate(f, i)
      val b = DialectFuzz.generate(f, i)
      assert(a == b, s"$f/$i not deterministic")
    }
  }

  test("every oracle statement embeds the files CTE or defines macros first") {
    for (f <- DialectFuzz.familyNames; i <- 0 until N) {
      val st = DialectFuzz.generate(f, i)
      // the recursive family merges the CTE into the statement's own
      // RECURSIVE list rather than prepending a second WITH
      assert(st.oracle.contains("WITH files AS") ||
        st.oracle.contains("WITH RECURSIVE files AS"),
        s"$f/$i oracle lacks files CTE")
      if (f == "macros")
        assert(st.oracle.toUpperCase.indexOf("CREATE MACRO") <
          st.oracle.indexOf("WITH files AS"), s"$f/$i macro DDL after CTE")
    }
  }

  test("rewrite pipeline is idempotent and balanced on generated statements") {
    def balance(s: String): (Int, Int) = {
      var paren = 0; var bracket = 0; var inStr = false
      s.foreach {
        case '\'' => inStr = !inStr
        case '(' if !inStr => paren += 1
        case ')' if !inStr => paren -= 1
        case '[' if !inStr => bracket += 1
        case ']' if !inStr => bracket -= 1
        case _ =>
      }
      (paren, bracket)
    }
    // The statement-level families (PIVOT/UNPIVOT/macros/FROM-first need
    // engine-side schema or state) — here only the expression-level
    // rewrite surface is checkable statically.
    val exprFamilies = Seq("qualify", "brackets", "listcomp", "distinct_on",
      "semianti", "mathops", "patterns", "ordered_agg", "regex_fns",
      "scalar_fns", "window", "win_exclude", "map_fns", "group_sets")
    for (f <- exprFamilies; i <- 0 until N) {
      val sql = DialectFuzz.generate(f, i).engine
      val once = Dialect.rewrite(sql)
      assert(Dialect.rewrite(once) == once, s"$f/$i not idempotent:\n$sql\n→ $once")
      assert(balance(once) == ((0, 0)), s"$f/$i unbalanced:\n$sql\n→ $once")
      val scrub = once.toUpperCase
        .replace("__GRAFT_QUALIFY", "").replace("__GRAFT_RN", "")
        .replace("__GRAFT_OB", "")
      assert(!scrub.contains("QUALIFY"), s"$f/$i QUALIFY survived: $once")
      assert(!scrub.contains("DISTINCT ON"), s"$f/$i DISTINCT ON survived: $once")
      assert(!scrub.contains("SIMILAR TO"), s"$f/$i SIMILAR TO survived: $once")
      assert(!scrub.contains("GLOB"), s"$f/$i GLOB survived: $once")
    }
  }

  test("window-frame EXCLUDE desugars to split frames (DuckDB-pinned shapes)") {
    def rw(s: String) = Dialect.rewrite(s)
    // both sides present: sum recombines NULL-aware
    val both = rw("SELECT sum(v) OVER (PARTITION BY p ORDER BY o " +
      "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS s FROM t")
    assert(both.contains("ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING"), both)
    assert(both.contains("ROWS BETWEEN 1 FOLLOWING AND 1 FOLLOWING"), both)
    assert(both.toUpperCase.contains("CASE WHEN"), both)
    assert(!both.toUpperCase.contains("EXCLUDE"), both)
    // one-sided frame: the same aggregate over the reduced frame
    val before = rw("SELECT min(v) OVER (ORDER BY o " +
      "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) AS s FROM t")
    assert(before.contains("ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING"), before)
    assert(!before.toUpperCase.contains("LEAST"), before)
    // current-row-only frame: DuckDB's empty-frame result
    val only = rw("SELECT count(v) OVER (ORDER BY o " +
      "ROWS BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE CURRENT ROW) AS s FROM t")
    assert(only.contains("CAST(0 AS BIGINT)"), only)
    // NO OTHERS is the default — stripped
    val noOthers = rw("SELECT sum(v) OVER (ORDER BY o " +
      "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE NO OTHERS) AS s FROM t")
    assert(!noOthers.toUpperCase.contains("EXCLUDE"), noOthers)
    assert(noOthers.contains("ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING"), noOthers)
    // GROUP/TIES desugar for the additive aggregates: RANGE helper
    // windows (peer-group algebra) appear, EXCLUDE disappears
    val grp = rw("SELECT sum(v) OVER (PARTITION BY p ORDER BY k " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS s FROM t")
    assert(!grp.toUpperCase.contains("EXCLUDE"), grp)
    assert(grp.contains("RANGE BETWEEN CURRENT ROW AND CURRENT ROW"), grp)
    assert(grp.toUpperCase.contains("CASE WHEN"), grp)
    val ties = rw("SELECT count(*) OVER (ORDER BY k " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES) AS s FROM t")
    assert(!ties.toUpperCase.contains("EXCLUDE"), ties)
    assert(ties.contains("+ 1"), ties)
    // RANGE frames desugar through the simpler peers-inside-frame
    // algebra: the peer-group window appears, EXCLUDE disappears
    val rng = rw("SELECT sum(v) OVER (PARTITION BY p ORDER BY k " +
      "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS s FROM t")
    assert(!rng.toUpperCase.contains("EXCLUDE"), rng)
    assert(rng.contains("RANGE BETWEEN CURRENT ROW AND CURRENT ROW"), rng)
    val rngCur = rw("SELECT avg(v) OVER (ORDER BY k " +
      "RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW) AS s FROM t")
    assert(!rngCur.toUpperCase.contains("EXCLUDE"), rngCur)
    // a RANGE frame that can't contain the current row fails loudly
    intercept[IllegalArgumentException](rw(
      "SELECT sum(v) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING EXCLUDE GROUP) FROM t"))
    // GROUPS frames: loud failure = parity (DuckDB 1.0.0 itself rejects
    // them — "GROUPS mode ... not implemented yet")
    intercept[IllegalArgumentException](rw(
      "SELECT sum(v) OVER (ORDER BY o GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) FROM t"))
    // min/max over GROUP/TIES are not window-decomposable — loud failure
    intercept[IllegalArgumentException](rw(
      "SELECT min(v) OVER (ORDER BY o ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) FROM t"))
    // GROUP without an ORDER BY fails loudly (peers are undefined)
    intercept[IllegalArgumentException](rw(
      "SELECT sum(v) OVER (PARTITION BY p ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) FROM t"))
    // the star modifier is untouched by the window pass
    assert(rw("SELECT * EXCLUDE (a, b) FROM t").toUpperCase.contains("EXCEPT"))
  }

  test("MAP literals rewrite to map(); bare braces stay named_struct") {
    assert(Dialect.rewrite("SELECT MAP {'a': x, 'b': y} FROM t")
      == "SELECT map('a', x, 'b', y) FROM t")
    assert(Dialect.rewrite("SELECT {'a': x} FROM t")
      == "SELECT named_struct('a', x) FROM t")
    // nested: a map value that is a struct
    val nested = Dialect.rewrite("SELECT MAP {'p': {'q': z}} FROM t")
    assert(nested == "SELECT map('p', named_struct('q', z)) FROM t", nested)
    // an identifier ending in ...map is not the MAP keyword
    assert(Dialect.rewrite("SELECT heatmap {'a': x} FROM t")
      .contains("named_struct"))
  }

  test("DISTINCT ON hoists unprojected sort columns into helper columns") {
    val in = "SELECT DISTINCT ON (lang) lang, path FROM files " +
      "ORDER BY lang NULLS FIRST, created DESC NULLS LAST, path"
    val out = Dialect.rewrite(in)
    assert(out.contains("created AS __graft_ob_0"), out)
    assert(out.contains("ORDER BY lang NULLS FIRST, __graft_ob_0 DESC NULLS LAST, path"), out)
    assert(out.contains("EXCEPT (__graft_rn, __graft_ob_0)"), out)
    // projected sort columns stay untouched — no helper emitted
    val in2 = "SELECT DISTINCT ON (lang) lang, path, n_chars FROM files " +
      "ORDER BY lang NULLS FIRST, n_chars DESC NULLS LAST, path"
    assert(!Dialect.rewrite(in2).contains("__graft_ob_"), Dialect.rewrite(in2))
    // a sort column literally NAMED like a direction keyword survives
    // whole (review r10: stripSortSuffix must not strip `last` to "")
    val in3 = "SELECT DISTINCT ON (id) id, v FROM people ORDER BY id, last"
    val out3 = Dialect.rewrite(in3)
    assert(out3.contains("last AS __graft_ob_0"), out3)
    assert(!out3.contains(", AS "), out3)
  }
}
