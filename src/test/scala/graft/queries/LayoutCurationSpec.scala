package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Behavior checks, beyond the DuckDB hash gate, for the round-7 layout
  * and curation operators: the Z-order key is verified invertible (bit
  * interleave decodes back to both coordinates), the CDC merge is
  * re-derived from a plain event fold, the A-ES weighted sample is
  * recomputed driver-side, and skew-audit/curriculum/dpo outputs are
  * checked against first-principles recomputations.
  */
class LayoutCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("z-order interleave is invertible and buckets bound both spans") {
    // Invertibility on the full 8-bit x 8-bit grid, against a plain
    // Scala reference interleave.
    def ref(x: Int, y: Int): Int =
      (0 until 8).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum
    val zs = for (x <- 0 until 256; y <- 0 until 256) yield ref(x, y)
    assert(zs.distinct.size == 65536, "interleave must be a bijection")

    // Every query output bucket must bound both dimension spans by the
    // theoretical cap: a 256-value z-range covers at most 16 distinct
    // values of each dimension (4 low bits each).
    val rows = SparkEntry.queries("q_zorder_layout")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (spanX, spanY) = (r.getAs[Long]("span_x"), r.getAs[Long]("span_y"))
      assert(spanX <= 15, s"bucket ${r.get(0)}: x span $spanX exceeds z-locality cap")
      assert(spanY <= 15, s"bucket ${r.get(0)}: y span $spanY exceeds z-locality cap")
    }
  }

  test("cdc merge equals a driver-side event fold over the base table") {
    val events = Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_type", "value", "unix_micros(ts) AS tsu", "event_id")
      .collect()
    // last event per user by (ts, event_id) — the compaction the query
    // window performs, re-derived as a plain fold.
    val last = events.groupBy(_.getLong(0)).map { case (u, es) =>
      u -> es.maxBy(r => (r.getLong(3), r.getLong(4)))
    }
    val base = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val expected = scala.collection.mutable.Map.empty[Long, (Double, String)]
    base.foreach { case (k, bal) => expected(k) = (bal, "keep") }
    last.foreach { case (u, r) =>
      val (typ, v) = (r.getString(1), r.getDouble(2))
      if (typ == "error") expected.remove(u)
      else expected(u) = (v, if (base.contains(u)) "update" else "insert")
    }

    val got = SparkEntry.queries("q_cdc_merge")(spark, sf).collect()
      .map(r => r.getAs[Long]("custkey") -> (r.getAs[Double]("acctbal"), r.getAs[String]("op")))
      .toMap
    assert(got.size == expected.size)
    assert(got == expected.toMap)
  }

  test("weighted sample equals a driver-side A-ES recomputation") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(sv: String): Long = {
      val hex = md.digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(_._2).iterator.flatMap { case (src, ds) =>
      val keyed = ds.map { case (id, _, w) =>
        val u = h60(id.toString).toDouble / math.pow(2.0, 60)
        val key = math.log(u).toFloat.toDouble / w.toDouble
        (id, key)
      }
      keyed.sortBy { case (id, key) => (-key, id) }.take(CurationQueries.WeightedK)
        .zipWithIndex.map { case ((id, _), i) => (src, i + 1) -> id }
    }.toMap
    val got = SparkEntry.queries("q_weighted_sample")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rn")) -> r.getAs[Long]("doc_id"))
      .toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("skew audit hitters match a direct count-and-sort") {
    val counts = Tables.load(spark, sf, "events")
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val expTop = counts.sortBy { case (u, n) => (-n, u) }.take(10)
    val rows = SparkEntry.queries("q_skew_audit")(spark, sf).collect()
    assert(rows.length == 10)
    rows.zip(expTop).foreach { case (r, (u, n)) =>
      assert(r.getAs[Long]("user_id") == u)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("share_ppm") == n * 1000000L / total)
    }
  }

  test("curriculum phases partition the corpus into ordered thirds") {
    val rows = SparkEntry.queries("q_curriculum")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("phase")).toSeq == Seq(1L, 2L, 3L))
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.load(spark, sf, "documents").count())
    // Bands are ordered and non-overlapping.
    val bands = rows.map(r => (r.getAs[Long]("min_qb"), r.getAs[Long]("max_qb")))
    assert(bands.sliding(2).forall { case Array((_, hi), (lo, _)) => hi < lo })
    // The histogram-threshold rule: phase 1 holds at least a third of
    // the corpus (its closing bucket crosses 1/3 cumulative), and phases
    // 1+2 hold at least two thirds.
    assert(rows(0).getAs[Long]("n_docs") * 3 >= total)
    assert((rows(0).getAs[Long]("n_docs") + rows(1).getAs[Long]("n_docs")) * 3 >= 2 * total)
  }

  test("paragraph dedup: exactly one keeper per distinct fingerprint") {
    val rows = SparkEntry.queries("q_para_dedup")(spark, sf).collect()
    val totalKept = rows.map(_.getAs[Long]("n_kept")).sum
    val distinctFps = graft.ops.Curation.chunkText(
        Tables.load(spark, sf, "documents"), "doc_id", "text",
        maxTokens = 32, overlap = 0)
      .select("fp").distinct().count()
    assert(totalKept == distinctFps,
      s"keepers $totalKept != distinct fingerprints $distinctFps")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_chunks"))
    }
  }

  test("source matrix total equals the near-dup pair count") {
    val matrix = SparkEntry.queries("q_dedup_sources")(spark, sf).collect()
    val totalPairs = matrix.map(_.getAs[Long]("n_pairs")).sum
    val ngramPairs = SparkEntry.queries("q_dedup_ngram")(spark, sf).count()
    assert(totalPairs == ngramPairs,
      s"matrix covers $totalPairs pairs, ngram query found $ngramPairs")
  }

  test("embedding outliers: dense ranks, cosines below the cell ceiling") {
    val rows = SparkEntry.queries("q_embed_outliers")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cell")).foreach { case (cell, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length),
        s"cell $cell ranks not dense")
      // outliers are the WORST fits: every reported cosine must sit at
      // or below the within-output maximum (sanity of ordering).
      val cs = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("own_cos_micro"))
      assert(cs.toSeq == cs.sorted.toSeq, s"cell $cell not ascending")
    }
  }

  test("dpo pairs: chosen strictly outranks rejected within its group") {
    val rows = SparkEntry.queries("q_dpo_pairs")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gap = r.getAs[Double]("quality_gap")
      assert(gap >= 0.0, s"gap must be non-negative, got $gap")
      assert(r.getAs[Long]("chosen_id") != r.getAs[Long]("rejected_id"))
    }
    // Singleton groups must be absent: every emitted group has >= 2 docs.
    val groups = Tables.load(spark, sf, "documents")
      .selectExpr("source", s"n_chars DIV ${CurationQueries.DpoLenBucket} AS b")
      .groupBy("source", "b").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[Long]("len_bucket"))
      assert(groups(k) >= 2, s"group $k emitted a pair with ${groups(k)} doc(s)")
    }
  }
}
