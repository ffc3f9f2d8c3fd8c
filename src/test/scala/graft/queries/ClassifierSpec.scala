package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}
import graft.ops.LinearClassifier

/** Behavior checks for the round-9 curation operators beyond the DuckDB
  * hash gate: the weak-label classifier must actually LEARN (holdout
  * accuracy well above the majority-class baseline) and its training
  * must be partitioning-invariant (the whole point of the integer
  * grid); the leakage audit and budget selector are checked for their
  * defining invariants.
  */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("LinearClassifier.step truncates toward zero like both engines") {
    // -7/2 = -3 in Scala, Spark div, and DuckDB // — the grid identity
    // the cross-engine weight equality rests on.
    assert(LinearClassifier.step(0L, -7L, 2L, 1L, 1L) == -3L)
    assert(LinearClassifier.step(0L, 7L, 2L, 1L, 1L) == 3L)
    assert(LinearClassifier.step(10L, -9L, 2L, 1L, 4L) == 9L)
  }

  test("classifier learns: holdout accuracy beats the majority baseline") {
    val rows = SparkEntry.queries("q_quality_classifier")(spark, sf)
      .collect()
    val hold = rows.filter(!_.getAs[Boolean]("is_train"))
    val total = hold.map(_.getAs[Long]("n")).sum
    val correct = hold.filter(r => r.getAs[Long]("y") == r.getAs[Long]("pred"))
      .map(_.getAs[Long]("n")).sum
    val majority = Seq(0L, 1L).map(c =>
      hold.filter(_.getAs[Long]("y") == c).map(_.getAs[Long]("n")).sum).max
    assert(total > 0)
    assert(correct.toDouble / total > 0.90,
      s"holdout accuracy ${correct.toDouble / total}")
    assert(correct > majority,
      s"correct=$correct must beat majority-class $majority")
    // the model is not degenerate: some weight moved off zero
    val w = (0 to 3).map(j => rows.head.getAs[Long](s"w$j"))
    assert(w.exists(_ != 0L), s"weights $w")
  }

  test("classifier training is partitioning-invariant (exact grid)") {
    val feats = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        expr("CAST(1000 AS BIGINT)").as("x0"),
        expr("CAST(n_chars % 997 AS BIGINT)").as("x1"),
        expr("CASE WHEN n_chars % 2 = 0 THEN CAST(1000 AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END").as("y1000"),
        lit(true).as("is_train"))
    val cols = Seq("x0", "x1")
    val w1 = LinearClassifier.train(
      feats.repartition(1), cols, "y1000", "is_train", 4, 1L, 4L)
    val w17 = LinearClassifier.train(
      feats.repartition(17), cols, "y1000", "is_train", 4, 1L, 4L)
    assert(w1.toSeq == w17.toSeq,
      s"weights must not depend on partitioning: ${w1.toSeq} vs ${w17.toSeq}")
  }

  test("incremental scoring: hash batch cuts across sources, drift is consistent") {
    val rows = SparkEntry.queries("q_classifier_incremental")(spark, sf)
      .collect()
    // the hash slice must give a drift BASELINE: many sources with both
    // batch and corpus rows (a modulus slice aliased with source and
    // produced rows with no corpus side at all)
    assert(rows.length >= 10, s"only ${rows.length} sources have batch rows")
    rows.foreach { r =>
      val d = r.getAs[Long]("drift_permille")
      if (r.getAs[Long]("n_corpus") == 0L)
        // a brand-new source (no corpus baseline) is maximal drift by
        // definition — never a silent NULL
        assert(d == 1000L && r.getAs[Boolean]("drifted"))
      else
        assert(d == math.abs(r.getAs[Long]("hi_batch_permille") -
          r.getAs[Long]("hi_corpus_permille")))
      assert(r.getAs[Boolean]("drifted") ==
        (d >= graft.queries.CurationQueries.ClfDriftPermille))
    }
  }

  test("split leakage audit only scores test docs, with consistent counts") {
    val rows = SparkEntry.queries("q_split_leakage")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id % 10 >= 8, s"doc $id is not in the test split")
      val g = r.getAs[Long]("n_grams")
      val l = r.getAs[Long]("n_leaked")
      assert(l >= 0 && l <= g)
      assert(r.getAs[Long]("leak_permille") == l * 1000 / g)
      assert(r.getAs[Boolean]("leaked") == (l > 0))
    }
  }

  test("token budget selection spends at most the 60% budget") {
    val rows = SparkEntry.queries("q_token_budget_select")(spark, sf)
      .collect()
    val totalTokens = Tables.load(spark, sf, "documents")
      .agg(expr("CAST(SUM(size(split(text, ' '))) AS BIGINT)"))
      .collect()(0).getLong(0)
    val budget = totalTokens * 6 / 10
    val kept = rows.map(r => Option(r.getAs[Long]("tokens_kept"))
      .getOrElse(0L)).sum
    assert(kept > 0 && kept <= budget, s"kept=$kept budget=$budget")
    // greedy fills the budget to within one document's tokens
    val maxDocTokens = Tables.load(spark, sf, "documents")
      .agg(expr("CAST(MAX(size(split(text, ' '))) AS BIGINT)"))
      .collect()(0).getLong(0)
    assert(budget - kept <= maxDocTokens,
      s"budget left unfilled beyond one doc: kept=$kept budget=$budget")
  }
}
