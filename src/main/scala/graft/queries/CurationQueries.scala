package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation operators a large-scale training-data pipeline runs
  * beyond per-document scoring: benchmark decontamination, stratified
  * sampling, and lexical relevance ranking (BM25). Like the other query
  * families, every operator is a declarative plan with an exact DuckDB
  * oracle; all ratios are single double divisions (or a final FLOAT
  * cast for the one transcendental-bearing score) so hashes match.
  */
object CurationQueries {

  /** Portable 60-bit hash (same as DedupQueries): low 15 hex chars of
    * md5. Spark conv(…,16,10) == DuckDB CAST('0x'||… AS BIGINT).
    */
  private def h60(c: String): String =
    s"CAST(conv(substr(md5($c), 1, 15), 16, 10) AS BIGINT)"

  /** Word n-gram size for decontamination overlap (the usual 13-gram of
    * eval-decontamination literature scaled down to the synthetic
    * corpus's short docs).
    */
  private[queries] val ContamN = 4

  /** Every BenchMod-th doc id is the stand-in "benchmark/eval" set; the
    * modulus keeps it a small, deterministic fraction at any SF.
    */
  private[queries] val BenchMod = 50

  /** n-gram expression over a pre-split words column `w` (same guard
    * style as DedupQueries.shinglesExpr — Spark sequence() descends on
    * n <= 0, hence the CASE).
    */
  private def gramExpr(n: Int): String = {
    val parts = (0 until n).map(j => s"element_at(w, i + $j)").mkString(", ")
    s"""array_distinct(
       |  CASE WHEN size(w) < $n THEN array()
       |       ELSE transform(sequence(1, size(w) - ${n - 1}),
       |              i -> concat_ws(' ', $parts))
       |  END)""".stripMargin
  }

  /** Persisted ContamN-gram hash frame `(doc_id, h)` — one copy per
    * (session, sf dir), shared by the benchmark and training sides of
    * the decontamination join (and across bench iterations), the same
    * convention as DedupQueries' shingle/word frames.
    */
  private val gramCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  private def gramsDF(s: SparkSession, d: String): DataFrame =
    Tables.memo(gramCache, (Tables.sessionKey(s), d))({
      Tables.load(s, d, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
        .select(col("doc_id"), explode(expr(gramExpr(ContamN))).as("g"))
        .select(col("doc_id"), expr(h60("g")).as("h"))
        .persist()
    })

  /** BM25 parameters and the probe query terms. */
  private val Bm25K1 = "1.2"
  private val Bm25B = "0.75"
  private[queries] val Bm25Terms = Seq("join", "window", "hash")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benchmark decontamination: flag every training document sharing at
    // least one word ContamN-gram with the benchmark set. The benchmark
    // side is small BY DEFINITION (it's an eval set), so it broadcasts:
    // the 100 TB training side is scanned once with a map-side hash join
    // — no shuffle of the corpus, no skew exposure (gram hashes repeat
    // only as often as grams repeat inside the tiny benchmark).
    "q_decontaminate" -> ((s, d) => {
      val grams = gramsDF(s, d)
      val bench = grams.filter(col("doc_id") % BenchMod === 0)
        .select(col("doc_id").as("bench_id"), col("h"))
      grams.filter(col("doc_id") % BenchMod =!= 0)
        .join(broadcast(bench), Seq("h"))
        .groupBy("doc_id")
        .agg(countDistinct("h").as("n_shared"), min("bench_id").as("min_bench_id"))
        .orderBy("doc_id")
    }),

    // Stratified deterministic sampling: per-language keep rates out of
    // 20, selected by the portable 60-bit hash of the key — reproducible
    // on any cluster, no rand(), and counted with a single hash
    // aggregate (the stratum column is data, not a shuffle key change).
    "q_stratified_sample" -> ((s, d) => {
      val rate = """CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 4 WHEN 'es' THEN 5
                   |     WHEN 'fr' THEN 8 WHEN 'zh' THEN 10 ELSE 3 END""".stripMargin
      Tables.load(s, d, "documents")
        .withColumn("kept", expr(s"${h60("CAST(doc_id AS STRING)")} % 20 < ($rate)"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          count(expr("CASE WHEN kept THEN 1 END")).as("n_kept"),
          min(expr("CASE WHEN kept THEN doc_id END")).as("first_kept"))
        .orderBy("lang")
    }),

    // BM25 top-15 for a fixed conjunctive keyword query. Per-term tf is
    // a codegen lambda over the pre-split words column; corpus stats
    // (N, df per term, avgdl) are ONE aggregate row broadcast back over
    // the corpus — the classic two-pass ranking shape that never
    // shuffles the documents themselves. The per-term score sum is
    // written as a fixed left-associated expression (not a SUM over
    // term rows) so IEEE addition order is identical in the oracle, and
    // the final score is cast to FLOAT to absorb any last-ulp ln()
    // difference between libm implementations.
    "q_bm25" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
        .withColumn("dl", size(col("w")))
      val withTf = Bm25Terms.foldLeft(docs) { (df, t) =>
        df.withColumn(s"tf_$t", expr(s"size(filter(w, x -> x = '$t'))"))
      }
      val dfAggs = Bm25Terms.map(t =>
        count(expr(s"CASE WHEN tf_$t > 0 THEN 1 END")).as(s"df_$t"))
      val aggCols = Seq(
        count(lit(1)).as("n_docs"),
        expr("CAST(sum(dl) AS DOUBLE) / count(1)").as("avgdl")) ++ dfAggs
      val stats = withTf.agg(aggCols.head, aggCols.tail: _*)
      val termScores = Bm25Terms.map { t =>
        s"(ln((CAST(n_docs - df_$t AS DOUBLE) + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5) + 1.0)" +
          s" * (CAST(tf_$t AS DOUBLE) * ($Bm25K1 + 1.0))" +
          s" / (CAST(tf_$t AS DOUBLE) + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * (CAST(dl AS DOUBLE) / avgdl))))"
      }
      withTf.crossJoin(broadcast(stats))
        .select(col("doc_id"),
          expr(s"CAST(${termScores.mkString(" + ")} AS FLOAT)").as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(15)
    })
  )

  // ---- DuckDB oracles (share the exact constants with the plans) ----

  private def duckH60(c: String): String =
    s"CAST('0x' || substr(md5($c), 1, 15) AS BIGINT)"

  private def duckGrams(n: Int): String = {
    val parts = (1 until n).map(j => s" || ' ' || w[i + $j]").mkString
    // DuckDB range(a, b) is stop-exclusive and empty when b <= a — no
    // CASE guard needed (it never descends like Spark's sequence).
    s"list_distinct(list_transform(range(1, len(w) - ${n - 2}), i -> w[i]$parts))"
  }

  val oracleSql: Map[String, String] = Map(
    "q_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |g0 AS (SELECT doc_id, UNNEST(${duckGrams(ContamN)}) AS g FROM d),
         |g AS (SELECT doc_id, ${duckH60("g")} AS h FROM g0),
         |bench AS (SELECT doc_id AS bench_id, h FROM g WHERE doc_id % $BenchMod = 0),
         |train AS (SELECT doc_id, h FROM g WHERE doc_id % $BenchMod <> 0)
         |SELECT doc_id, COUNT(DISTINCT t.h) AS n_shared, MIN(bench_id) AS min_bench_id
         |FROM train t JOIN bench b ON t.h = b.h
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_stratified_sample" ->
      s"""SELECT lang, COUNT(*) AS n_total,
         |  COUNT(CASE WHEN kept THEN 1 END) AS n_kept,
         |  MIN(CASE WHEN kept THEN doc_id END) AS first_kept
         |FROM (SELECT lang, doc_id,
         |        ${duckH60("CAST(doc_id AS VARCHAR)")} % 20 <
         |          (CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 4 WHEN 'es' THEN 5
         |                WHEN 'fr' THEN 8 WHEN 'zh' THEN 10 ELSE 3 END) AS kept
         |      FROM documents)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_bm25" -> {
      val tfs = Bm25Terms.map(t =>
        s"len(list_filter(w, x -> x = '$t')) AS tf_$t").mkString(",\n  ")
      val dfs = Bm25Terms.map(t =>
        s"COUNT(CASE WHEN tf_$t > 0 THEN 1 END) AS df_$t").mkString(",\n  ")
      val scores = Bm25Terms.map { t =>
        s"(ln((CAST(n_docs - df_$t AS DOUBLE) + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5) + 1.0)" +
          s" * (CAST(tf_$t AS DOUBLE) * ($Bm25K1 + 1.0))" +
          s" / (CAST(tf_$t AS DOUBLE) + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * (CAST(dl AS DOUBLE) / avgdl))))"
      }
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |tf AS (SELECT doc_id, len(w) AS dl,
         |  $tfs
         |  FROM d),
         |stats AS (SELECT COUNT(*) AS n_docs,
         |  CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         |  $dfs
         |  FROM tf)
         |SELECT doc_id,
         |  CAST(${scores.mkString(" + ")} AS REAL) AS score
         |FROM tf CROSS JOIN stats
         |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin
    }
  )
}
