package graft.fm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for the distributional aggregates and series generators. Every
  * expected value is DuckDB v1.0.0 output, captured via the oracle
  * binary before the expressions were written; engine-level parity over
  * real corpora is covered by the `dist_agg`/`series_fns` fuzz families.
  */
class DistributionalSpec extends AnyFunSuite {

  private lazy val session = {
    val s = TestSpark.spark.newSession()
    Dialect.register(s)
    Dialect.registerOverrides(s)
    import s.implicits._
    Seq(1, 2, 3, 4).toDF("x").createOrReplaceTempView("n4")
    Seq(10, 20, 30, 40).toDF("x").createOrReplaceTempView("t4")
    Seq(10, 20, 30).toDF("x").createOrReplaceTempView("t3")
    Seq("a", "b", "c", "d").toDF("x").createOrReplaceTempView("s4")
    Seq[Integer](null, null).toDF("x").createOrReplaceTempView("nulls")
    s
  }

  private def one(sql: String): Any = session.sql(sql).collect()(0).get(0)

  test("quantile_cont interpolates at q*(n-1): DuckDB-pinned values") {
    assert(one("SELECT quantile_cont(x, 0.5) FROM n4") == 2.5)
    assert(one("SELECT quantile_cont(x, 0.3) FROM t4") == 19.0)
    assert(one("SELECT quantile_cont(x, 0.0) FROM t3") == 10.0)
    assert(one("SELECT quantile_cont(x, 1.0) FROM t3") == 30.0)
  }

  test("quantile_cont: negative q indexes from the end (cont(-q) = cont(1+q))") {
    assert(one("SELECT quantile_cont(x, -0.25) FROM t4") == 32.5)
  }

  test("quantile_cont: a list of quantiles returns a list, same order") {
    assert(one("SELECT quantile_cont(x, array(0.25, 0.5)) FROM n4") ==
      Seq(1.75, 2.5))
  }

  test("quantile_cont over dates returns interpolated TIMESTAMPs") {
    val r = one("SELECT quantile_cont(d, 0.5) FROM VALUES " +
      "(DATE '2024-01-01'), (DATE '2024-01-03') AS v(d)")
    assert(r.toString == "2024-01-02 00:00:00.0")
  }

  test("quantile_cont rejects strings and out-of-range fractions loudly") {
    intercept[Exception](session.sql(
      "SELECT quantile_cont(x, 0.5) FROM s4").collect())
    intercept[Exception](session.sql(
      "SELECT quantile_cont(x, 1.5) FROM n4").collect())
  }

  test("quantile_disc picks rank max(1, ceil(q*n)); quantile is its alias") {
    assert(one("SELECT quantile_disc(x, 0.5) FROM n4") == 2)
    assert(one("SELECT quantile_disc(x, 0.3) FROM t4") == 20)
    assert(one("SELECT quantile_disc(x, 0.5) FROM t3") == 20)
    assert(one("SELECT quantile(x, 0.5) FROM n4") == 2)
    assert(one("SELECT quantile_disc(x, 0.0) FROM t3") == 10)
    assert(one("SELECT quantile_disc(x, 1.0) FROM t3") == 30)
  }

  test("quantile_disc: negative q is rank floor((1+q)*n)+1 — the 3rd of 4, not the 2nd") {
    assert(one("SELECT quantile_disc(x, -0.5) FROM t4") == 30)
    assert(one("SELECT quantile_disc(x, -1.0) FROM t3") == 10)
  }

  test("quantile_disc works on strings (Spark's percentile_disc cannot)") {
    assert(one("SELECT quantile_disc(x, 0.5) FROM s4") == "b")
    assert(one("SELECT quantile_disc(x, array(0.2, 0.8)) FROM t3") ==
      Seq(10, 30))
  }

  test("median: interpolated for numerics, lower-middle element for strings") {
    assert(one("SELECT median(x) FROM n4") == 2.5)
    assert(one("SELECT median(x) FROM s4") == "b")
    assert(one("SELECT median(x) FROM nulls") == null)
  }

  test("histogram: value→count map, keys ascending, NULL on empty") {
    assert(one("SELECT histogram(v) FROM VALUES ('b'), ('a'), ('b') AS t(v)") ==
      Map("a" -> 1L, "b" -> 2L))
    assert(one("SELECT histogram(x) FROM nulls") == null)
    // keys come out sorted, not insertion-ordered
    val m = session.sql(
      "SELECT histogram(v) FROM VALUES (3), (1), (2), (1) AS t(v)")
      .collect()(0).getMap[Int, Long](0)
    assert(m.keys.toSeq == Seq(1, 2, 3))
  }

  test("product: DOUBLE product, NULLs skipped, NULL on empty") {
    assert(one("SELECT product(v) FROM VALUES (1.5), (2.0), (-3.0) AS t(v)") == -9.0)
    assert(one("SELECT product(v) FROM VALUES (2), (3), (NULL) AS t(v)") == 6.0)
    assert(one("SELECT product(x) FROM nulls") == null)
  }

  test("generate_series is end-inclusive; range is end-exclusive; BIGINT out") {
    assert(one("SELECT generate_series(1, 5)") == Seq(1L, 2L, 3L, 4L, 5L))
    assert(one("SELECT generate_series(1, 10, 3)") == Seq(1L, 4L, 7L, 10L))
    assert(one("SELECT range(1, 5)") == Seq(1L, 2L, 3L, 4L))
    assert(one("SELECT range(1, 10, 3)") == Seq(1L, 4L, 7L))
  }

  test("single-arg series start at 0: generate_series(n) includes n, range(n) excludes") {
    assert(one("SELECT generate_series(2)") == Seq(0L, 1L, 2L))
    assert(one("SELECT range(3)") == Seq(0L, 1L, 2L))
  }

  test("an unreachable stop (wrong sign or zero step) is EMPTY, not an error") {
    assert(one("SELECT generate_series(5, 1)") == Seq.empty)
    assert(one("SELECT generate_series(1, 5, -1)") == Seq.empty)
    assert(one("SELECT range(5, 1)") == Seq.empty)
    assert(one("SELECT range(1, 5, 0)") == Seq.empty)
    assert(one("SELECT range(3, 3)") == Seq.empty)
    assert(one("SELECT generate_series(3, 3)") == Seq(3L))
  }

  test("descending series with a negative step") {
    assert(one("SELECT generate_series(10, 1, -3)") == Seq(10L, 7L, 4L, 1L))
    assert(one("SELECT range(5, 1, -1)") == Seq(5L, 4L, 3L, 2L))
  }

  test("date/timestamp series promote to TIMESTAMP; range shaves the stop") {
    val g = session.sql("SELECT generate_series(DATE '2025-01-01', " +
      "DATE '2025-01-03', INTERVAL 1 DAY)").collect()(0).getSeq[Any](0)
    assert(g.map(_.toString) == Seq("2025-01-01 00:00:00.0",
      "2025-01-02 00:00:00.0", "2025-01-03 00:00:00.0"))
    val r = session.sql("SELECT range(DATE '2025-01-01', " +
      "DATE '2025-01-03', INTERVAL 1 DAY)").collect()(0).getSeq[Any](0)
    assert(r.map(_.toString) == Seq("2025-01-01 00:00:00.0",
      "2025-01-02 00:00:00.0"))
    assert(one("SELECT generate_series(TIMESTAMP '2025-01-02 00:00:00', " +
      "TIMESTAMP '2025-01-01 00:00:00', INTERVAL 1 DAY)") == Seq.empty)
    assert(one("SELECT generate_series(DATE '2025-01-01', " +
      "DATE '2025-01-02', INTERVAL 0 DAY)") == Seq.empty)
  }

  test("FROM-position series desugar to an explode named after the function") {
    val rw = Dialect.rewriteSeriesFrom(
      "SELECT * FROM generate_series(1, 4) gs")
    assert(rw.contains("(SELECT explode(generate_series(1, 4)) AS generate_series) gs"))
    // scalar (SELECT-position) calls stay put
    assert(Dialect.rewriteSeriesFrom("SELECT range(1, 4) AS r") ==
      "SELECT range(1, 4) AS r")
    // window RANGE frames are untouched
    val w = "SELECT sum(x) OVER (ORDER BY x RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM t4"
    assert(Dialect.rewriteSeriesFrom(w) == w)
    val rows = session.sql(Dialect.rewrite(
      "SELECT gs.generate_series AS n FROM generate_series(1, 3) gs ORDER BY n"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L, 2L, 3L))
  }

  test("quantiles group correctly with map-side partial aggregation") {
    import session.implicits._
    val df = (1 to 1000).map(i => (i % 4, i)).toDF("g", "v").repartition(8)
    df.createOrReplaceTempView("big")
    val rows = session.sql(
      "SELECT g, quantile_disc(v, 0.5) AS d, quantile_cont(v, 0.5) AS c, " +
        "histogram(v % 2) AS h FROM big GROUP BY g ORDER BY g").collect()
    assert(rows.length == 4)
    // group g: values g, g+4, ..., ≤1000 — 250 each; rank ceil(125)=125th
    val d0 = rows(0).getInt(1)
    assert(d0 == 4 * 125) // group 0: 4, 8, …, 1000; 125th is 500
    assert(rows(0).getMap[Int, Long](3).values.sum == 250L)
  }
}
