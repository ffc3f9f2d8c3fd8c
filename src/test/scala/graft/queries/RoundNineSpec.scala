package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Behavior checks for the round-9 operators beyond the DuckDB hash gate:
  * the theta sketch's set-operation estimates are pinned to their k=32
  * error envelope against the exact answers the same row carries, the
  * seeded global shuffle is checked for permutation-ness (contiguous,
  * gap-free positions) and for seed sensitivity, the segment cleanup for
  * its conservation law (kept + removed = total) and idempotence, and
  * the pivot report against an independent DataFrame recomputation.
  */
class RoundNineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("q_theta_setops estimates stay inside the k=32 envelope") {
    val r = SparkEntry.queries("q_theta_setops")(spark, sf).collect().head
    val exactUnion = r.getAs[Long]("exact_union")
    val exactInter = r.getAs[Long]("exact_inter")
    val estUnion = r.getAs[Double]("est_union")
    val estInter = r.getAs[Double]("est_inter")
    assert(exactUnion > 0 && estUnion > 0.0)
    // KMV relative standard error is ~1/sqrt(k-2) = 18%; 3 sigma.
    assert(math.abs(estUnion - exactUnion) / exactUnion < 0.55,
      s"union exact=$exactUnion est=$estUnion")
    // Intersection error is relative to the UNION size (theta counts
    // common hashes below the union threshold), not the intersection.
    assert(math.abs(estInter - exactInter) / exactUnion < 0.55,
      s"inter exact=$exactInter est=$estInter union=$exactUnion")
    // Set algebra sanity: |A∩B| <= min(|A|,|B|) <= max <= |A∪B| exactly.
    val (a, b) = (r.getAs[Long]("exact_a"), r.getAs[Long]("exact_b"))
    assert(exactInter <= math.min(a, b) && math.max(a, b) <= exactUnion)
    assert(a + b == exactUnion + exactInter)
  }

  test("q_train_shuffle positions form an exact gap-free permutation") {
    val rows = SparkEntry.queries("q_train_shuffle")(spark, sf)
      .orderBy("block").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(total == nDocs, s"positions=$total docs=$nDocs")
    // blocks tile [0, nDocs) with no gaps or overlaps
    var expectedLo = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("pos_lo") == expectedLo)
      assert(r.getAs[Long]("pos_hi") == expectedLo + r.getAs[Long]("n") - 1)
      expectedLo += r.getAs[Long]("n")
    }
    assert(expectedLo == nDocs)
  }

  test("train shuffle order is seed-keyed: same seed stable, new seed reorders") {
    import graft.ops.PrefixSum
    def order(seed: String): Array[Long] = {
      val keyed = graft.Tables.load(spark, sf, "documents")
        .select(col("doc_id"),
          expr(s"CAST(conv(substr(md5(concat('$seed:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)").as("hk"))
        .withColumn("_ord", struct(col("hk"), col("doc_id")))
        .withColumn("one", lit(1L))
      PrefixSum.runningBefore(keyed, "_ord", "one", 8)
        .orderBy("cum_before").select("doc_id").collect().map(_.getLong(0))
    }
    val o1 = order("seedA")
    val o2 = order("seedA")
    val o3 = order("seedB")
    assert(o1.sameElements(o2), "same seed must reproduce the same order")
    assert(!o1.sameElements(o3), "a different seed must permute differently")
    assert(o1.sorted.sameElements(o3.sorted), "both are permutations of the ids")
  }

  test("q_seg_dedup conserves segments and only ever removes") {
    val rows = SparkEntry.queries("q_seg_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    var removedTotal = 0L
    rows.foreach { r =>
      val (total, removed, withDups) = (r.getAs[Long]("segs_total"),
        r.getAs[Long]("segs_removed"), r.getAs[Long]("docs_with_dups"))
      assert(removed >= 0 && removed < total)
      assert(withDups <= r.getAs[Long]("n_docs"))
      assert((removed == 0) == (withDups == 0))
      removedTotal += removed
    }
    assert(removedTotal > 0, "fixture corpus must exercise the removal path")
  }

  test("segment cleanup is idempotent: re-running on cleaned text removes nothing") {
    val w = DedupQueries.SegW
    val cleaned = graft.Tables.load(spark, sf, "documents")
      .select(split(col("text"), " ").as("w"))
      .withColumn("segs", expr(
        s"""CASE WHEN size(w) DIV $w = 0 THEN array()
           |     ELSE transform(sequence(1, size(w) DIV $w),
           |            i -> concat_ws(' ', slice(w, (i - 1) * $w + 1, $w)))
           |END""".stripMargin))
      .withColumn("keep", expr(
        "filter(segs, (x, i) -> array_position(segs, x) = i + 1)"))
      .select(concat_ws(" ", col("keep")).as("text"))
    val second = cleaned
      .select(split(col("text"), " ").as("w"))
      .withColumn("segs", expr(
        s"""CASE WHEN size(w) DIV $w = 0 THEN array()
           |     ELSE transform(sequence(1, size(w) DIV $w),
           |            i -> concat_ws(' ', slice(w, (i - 1) * $w + 1, $w)))
           |END""".stripMargin))
      .withColumn("keep", expr(
        "filter(segs, (x, i) -> array_position(segs, x) = i + 1)"))
      .agg(sum(size(col("segs")) - size(col("keep")))).collect().head.getLong(0)
    assert(second == 0L, s"second pass removed $second segments")
  }

  test("q_quality_norm keeps exactly the top half of each source") {
    val rows = SparkEntry.queries("q_quality_norm")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, fair) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept_fair"))
      // rk*2 > n keeps ranks in (n/2, n] — exactly ceil(n/2) docs
      assert(fair == (n + 1) / 2, s"${r.getString(0)}: n=$n fair=$fair")
    }
    // the global-cut audit column must agree with an independent count
    val globalKept = rows.map(_.getAs[Long]("n_kept_global")).sum
    val q = graft.queries.TextQueries
    val scored = graft.Tables.load(spark, sf, "documents")
      .selectExpr(s"${q.QualityExpr} AS qv")
    val med = scored.agg(expr("percentile(qv, 0.5)")).collect().head.getDouble(0)
    val expected = scored.filter(col("qv") > med).count()
    assert(globalKept == expected)
  }

  test("q_pivot_report cells match an independent long-form recomputation") {
    val wide = SparkEntry.queries("q_pivot_report")(spark, sf).collect()
      .map(r => r.getAs[Long]("month") ->
        Seq("urgent_cents", "high_cents", "medium_cents", "notspec_cents",
          "low_cents").map(c => if (r.isNullAt(r.fieldIndex(c))) 0L
          else r.getAs[Long](c)).sum).toMap
    val long = graft.Tables.load(spark, sf, "orders")
      .groupBy(expr("CAST(month(o_orderdate) AS BIGINT)").as("month"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .collect().map(r => r.getAs[Long]("month") -> r.getAs[Long]("cents")).toMap
    assert(wide == long)
    assert(wide.size == 12)
  }
}
