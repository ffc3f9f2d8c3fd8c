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
}
