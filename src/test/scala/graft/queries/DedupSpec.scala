package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Consistency checks for the dedup family beyond the DuckDB hash gate:
  * the incremental ingest operator must agree exactly with the full
  * pairwise SimHash query restricted to batch-corpus pairs.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("containment catches a doc contained in a longer one that Jaccard misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // doc 1 = shingles {1..4}; doc 2 = {1..20}: containment of 1 in 2 is
    // 1000 permille while Jaccard is 4/20 = 0.2 — below the 0.5 dedup
    // threshold. The asymmetric measure must flag it AND mark the miss.
    val sh = ((1L to 4L).map(h => (1L, h)) ++ (1L to 20L).map(h => (2L, h)))
      .toDF("doc_id", "sh")
    val pairs = DedupQueries.jaccardPairs(sh, maxDocFreq = 10)
      .withColumn("cont_a", expr("(common * 1000) div na"))
      .withColumn("cont_b", expr("(common * 1000) div nb"))
      .collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getAs[Long]("common") == 4L)
    assert(r.getAs[Long]("cont_a") == 1000L) // A fully inside B
    assert(r.getAs[Long]("cont_b") == 200L)
    assert(r.getAs[Double]("jac") < 0.5)     // symmetric dedup misses it
  }

  test("q_tfidf_sim matches an independent tf-idf cosine computation") {
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ").toSeq).toMap
    val nd = texts.size.toDouble
    val df = texts.values.toSeq.flatMap(_.distinct)
      .groupBy(identity).map { case (w, os) => w -> os.size }
    def idfK(w: String): Long =
      math.round((math.log(nd / df(w)).toFloat).toDouble * 1000)
    def wts(id: Long): Map[String, Long] =
      texts(id).groupBy(identity).map { case (w, os) => w -> os.size * idfK(w) }
    val rows = SparkEntry.queries("q_tfidf_sim")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ia, ib, cos) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (wa, wb) = (wts(ia), wts(ib))
      val dot = wa.keySet.intersect(wb.keySet).toSeq
        .map(w => wa(w) * wb(w)).sum
      def n2(m: Map[String, Long]) = m.values.map(v => v * v).sum
      val expected = dot.toDouble / (math.sqrt(n2(wa).toDouble) * math.sqrt(n2(wb).toDouble))
      assert(cos == expected, s"pair ($ia,$ib): $cos vs $expected")
      // valid cosine over non-negative weights; note a high shingle
      // Jaccard does NOT imply a high tf-idf cosine (idf downweights
      // the shared common words) — that re-ranking power is the point
      assert(cos > 0.0 && cos <= 1.0)
    }
  }

  test("q_dedup_incremental agrees with the pairwise SimHash query") {
    val pairs = SparkEntry.queries("q_dedup_simhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m = DedupQueries.IncrMod
    // batch-corpus matches from the full pair list (either side of the
    // unordered pair may be the batch doc)
    val expected = (pairs.collect { case (a, b) if a % m == 0 && b % m != 0 => a -> b } ++
      pairs.collect { case (a, b) if b % m == 0 && a % m != 0 => b -> a })
      .groupBy(_._1)
      .map { case (id, ms) => id -> (ms.length.toLong, ms.map(_._2).min) }
    val rows = SparkEntry.queries("q_dedup_incremental")(spark, sf).collect()
    assert(rows.nonEmpty)
    val flagged = rows.filter(_.getBoolean(3))
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(flagged == expected)
    // every batch doc gets a row; non-flagged rows carry zero matches
    rows.filterNot(_.getBoolean(3)).foreach { r =>
      assert(r.getLong(1) == 0 && r.isNullAt(2))
    }
    assert(rows.length == spark.read.parquet(s"$sf/documents.parquet")
      .filter(s"doc_id % $m = 0").count())
  }

  test("q_substr_dedup: removal invariants and exact-duplicate cleanup") {
    val rows = SparkEntry.queries("q_substr_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r =>
      r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(4))).toMap
    // invariants: 0 < n_removed <= n_tokens; the cleaned head is empty
    // exactly when everything was removed (head is a 60-char prefix)
    byId.foreach { case (id, (nTok, nRem, head)) =>
      assert(nRem > 0 && nRem <= nTok, s"doc $id: $nRem of $nTok")
      if (nRem == nTok) assert(head.isEmpty, s"doc $id")
    }
    // the smallest doc_id of the whole corpus can never lose a span (it
    // is the keeper of every gram it contains)
    val minDoc = graft.Tables.load(spark, sf, "documents")
      .agg(org.apache.spark.sql.functions.min("doc_id")).collect()(0).getLong(0)
    assert(!byId.contains(minDoc), s"corpus-min doc $minDoc was cleaned")
    // near-dup coverage is real at this sf: some docs are fully covered
    // by cross-doc spans, others only partially
    assert(byId.values.exists { case (nTok, nRem, _) => nRem == nTok })
    assert(byId.values.exists { case (nTok, nRem, _) => nRem < nTok })
  }
}
