package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over `documents` — the quality/language/token
  * signals a training-data pipeline computes per document. All pure
  * column expressions (whole-stage codegen, no UDFs), each replayed
  * exactly by the DuckDB oracle: counts are integers, ratios are a single
  * double division of identical integers, so hashes match bit-for-bit.
  */
object TextQueries {

  /** Keyword profiles for the language-ID mechanism: per-profile marker
    * word lists, score = hits/tokens, argmax with name-order tie-break.
    * With a real multilingual corpus these are per-language stopword
    * lists; the synthetic corpus shares one vocabulary, so profiles
    * partition it by domain instead — the scoring machinery is identical.
    */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "lang_art" -> Seq("the", "a", "value", "line"),
    "lang_db" -> Seq("table", "row", "column", "key", "query"),
    "lang_ops" -> Seq("scan", "merge", "sort", "join", "filter", "hash"),
    "lang_str" -> Seq("stream", "batch", "window", "vector", "group"))

  private def hitsExpr(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("array(", ", ", ")")
    s"size(filter(split(lower(text), ' '), x -> array_contains($arr, x)))"
  }

  private def duckHitsExpr(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(string_split(lower(text), ' '), x -> list_contains($arr, x)))"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-document stats + md5 fingerprint (the rolling-hash analogue for
    // whole-document identity).
    "q_text_stats" -> ((s, d) => {
      Tables.load(s, d, "documents").selectExpr(
        "doc_id",
        "size(split(text, ' ')) AS n_tokens",
        "size(array_distinct(split(lower(text), ' '))) AS n_distinct",
        "CAST(size(array_distinct(split(lower(text), ' '))) AS DOUBLE) / size(split(text, ' ')) AS ttr",
        "CAST(aggregate(transform(split(text, ' '), x -> length(x)), 0, (acc, x) -> acc + x) AS DOUBLE) / size(split(text, ' ')) AS avg_wlen",
        "md5(text) AS fp"
      ).orderBy("doc_id")
    }),

    // Token counting two ways: whitespace and a BPE-ish regex
    // ([letters]+ | [digits]+ | single other symbol).
    "q_token_count" -> ((s, d) => {
      Tables.load(s, d, "documents").selectExpr(
        "doc_id",
        "size(split(text, ' ')) AS ws_tokens",
        "size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS re_tokens"
      ).orderBy("doc_id")
    }),

    // Language-ID mechanism: marker-profile scoring with argmax.
    "q_text_langid" -> ((s, d) => {
      val hits = profiles.map { case (name, words) => s"${hitsExpr(words)} AS h_$name" }
      val Seq(p1, p2, p3, p4) = profiles.map(_._1)
      val predicted =
        s"""CASE WHEN h_$p1 >= h_$p2 AND h_$p1 >= h_$p3 AND h_$p1 >= h_$p4 THEN '$p1'
           |     WHEN h_$p2 >= h_$p3 AND h_$p2 >= h_$p4 THEN '$p2'
           |     WHEN h_$p3 >= h_$p4 THEN '$p3'
           |     ELSE '$p4' END AS predicted""".stripMargin
      Tables.load(s, d, "documents")
        .selectExpr(Seq("doc_id", "size(split(text, ' ')) AS n_tokens") ++ hits: _*)
        .selectExpr("doc_id", predicted,
          s"CAST(h_$p1 AS DOUBLE) / n_tokens AS art_ratio")
        .orderBy("doc_id")
    }),

    // Deterministic hash sampling (data curation): a stable ~10% sample
    // selected by portable 60-bit hash of the key — the reproducible
    // distributed alternative to rand()-based sampling. Reported per
    // language so stratification is visible.
    "q_sample_hash" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .withColumn("h", expr(
          "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
        .filter(col("h") % 10 === 0)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), min("doc_id").as("first_id"))
        .orderBy("lang")
    }),

    // Corpus-wide bigram frequencies (n-gram language-model building
    // block): top 20 by count with deterministic tie-break.
    "q_text_bigrams" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .withColumn("w", split(lower(col("text")), " "))
        .select(explode(expr(
          """CASE WHEN size(w) < 2 THEN array()
            |     ELSE transform(sequence(1, size(w) - 1),
            |            i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))
            |END""".stripMargin)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    }),

    // Quality scoring: length band + type-token ratio + stopword ratio.
    "q_text_quality" -> ((s, d) => {
      Tables.load(s, d, "documents").selectExpr(
        "doc_id",
        "size(split(text, ' ')) AS n_tokens",
        """0.5 * (CAST(size(array_distinct(split(lower(text), ' '))) AS DOUBLE) / size(split(text, ' ')))
          | + 0.25 * (CASE WHEN size(split(text, ' ')) BETWEEN 20 AND 120 THEN 1.0 ELSE 0.0 END)
          | + 0.25 * (CAST(size(filter(split(lower(text), ' '), x -> array_contains(array('the', 'a'), x))) AS DOUBLE) / size(split(text, ' ')))
          | AS quality""".stripMargin.replace("\n", " ")
      ).orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_text_stats" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(lower(text), ' '))) AS n_distinct,
        |  CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS ttr,
        |  CAST(list_aggregate(list_transform(string_split(text, ' '), x -> len(x)), 'sum') AS DOUBLE) / len(string_split(text, ' ')) AS avg_wlen,
        |  md5(text) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_langid" -> {
      val hits = profiles.map { case (name, words) => s"${duckHitsExpr(words)} AS h_$name" }
      val Seq(p1, p2, p3, p4) = profiles.map(_._1)
      s"""WITH h AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         |    ${hits.mkString(",\n    ")}
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN h_$p1 >= h_$p2 AND h_$p1 >= h_$p3 AND h_$p1 >= h_$p4 THEN '$p1'
         |       WHEN h_$p2 >= h_$p3 AND h_$p2 >= h_$p4 THEN '$p2'
         |       WHEN h_$p3 >= h_$p4 THEN '$p3'
         |       ELSE '$p4' END AS predicted,
         |  CAST(h_$p1 AS DOUBLE) / n_tokens AS art_ratio
         |FROM h ORDER BY doc_id""".stripMargin
    },
    "q_sample_hash" ->
      """SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS first_id
        |FROM documents
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10 = 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_bigrams" ->
      """WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
        |b AS (SELECT UNNEST(list_transform(range(1, len(ws)),
        |        i -> ws[i] || ' ' || ws[i + 1])) AS bigram FROM w)
        |SELECT bigram, COUNT(*) AS n FROM b
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  0.5 * (CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE) / len(string_split(text, ' ')))
        |   + 0.25 * (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 120 THEN 1.0 ELSE 0.0 END)
        |   + 0.25 * (CAST(len(list_filter(string_split(lower(text), ' '), x -> list_contains(['the', 'a'], x))) AS DOUBLE) / len(string_split(text, ' ')))
        |   AS quality
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
