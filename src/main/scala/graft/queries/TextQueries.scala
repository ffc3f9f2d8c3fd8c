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

  /** Portable 60-bit hash (same as DedupQueries): first (most-significant) 15 hex chars of
    * md5. Spark conv(…,16,10) == DuckDB CAST('0x'||… AS BIGINT).
    */
  private def h60(c: String): String =
    s"CAST(conv(substr(md5($c), 1, 15), 16, 10) AS BIGINT)"

  /** Winnowing (Schleimer et al., MOSS): k-gram size and window width.
    * Every substring match of length >= WinK + WinW - 1 is guaranteed to
    * share a fingerprint — the local-document fingerprint scheme, vs the
    * whole-document md5 in q_text_stats.
    */
  /** PMI collocation floor: pairs seen fewer times carry no stable
    * signal and amplify log-ratio noise. Shared with the oracle.
    */
  private[queries] val PmiMinCount = 5

  /** Zipf-fit depth: ranks 1..ZipfTop enter the log-log regression. */
  private[queries] val ZipfTop = 100

  /** `x * ln(x)` on the exact micro-nat grid (x a positive integer
    * column), FLOAT-collapsing the ln before the exact int-double
    * product — the entropy term both engines compute bit-identically.
    */
  private[queries] def EntUnats(c: String, floatT: String): String =
    s"CAST(ROUND(CAST($c AS DOUBLE) * " +
      s"CAST(CAST(ln(CAST($c AS DOUBLE)) AS $floatT) AS DOUBLE) * 1000000) AS BIGINT)"

  /** ln(col) on the exact micro-nat integer grid, FLOAT-collapsed first
    * (floatT = FLOAT for Spark, REAL for DuckDB) so JVM/libm last-ulp
    * differences cannot reach the regression sums.
    */
  private[queries] def ZipfUnats(c: String, floatT: String): String =
    s"CAST(ROUND(CAST(CAST(ln(CAST($c AS DOUBLE)) AS $floatT) AS DOUBLE) * 1000000) AS BIGINT)"

  /** Micro-nat PMI of a (c12, c1, c2, n, nb) row — probability ratios
    * in one fixed-shape double expression, FLOAT-collapsed before the
    * integer grid; ONE definition for the Spark plan (floatT = FLOAT)
    * and the DuckDB oracle (floatT = REAL).
    */
  private[queries] def PmiUnatsExpr(floatT: String): String =
    "CAST(ROUND(CAST(CAST(ln((CAST(c12 AS DOUBLE) / nb) / " +
      "((CAST(c1 AS DOUBLE) / n) * (CAST(c2 AS DOUBLE) / n))) " +
      s"AS $floatT) AS DOUBLE) * 1000000) AS BIGINT)"

  private[queries] val WinK = 8
  private[queries] val WinW = 4

  /** Cross-document duplicate-span detection: longer grams than the
    * per-doc fingerprint (any shared substring of CrossK + CrossW - 1 =
    * 23 chars — about four words — is guaranteed to share a
    * fingerprint), a doc-frequency cutoff dropping boilerplate
    * fingerprints BEFORE pair generation (bounds every join key's
    * fan-out, same discipline as the hot-shingle guard in
    * DedupQueries), and a minimum shared-fingerprint count to call a
    * pair a duplicate span.
    */
  private[queries] val CrossK = 16
  private[queries] val CrossW = 8
  private[queries] val CrossMaxDf = 20
  private[queries] val CrossMinShared = 3

  /** Composite quality score (length band + TTR + stopword ratio) —
    * ONE definition per dialect, shared by q_text_quality and the
    * corpus-relative threshold filter.
    */
  private[queries] val QualityExpr =
    """0.5 * (CAST(size(array_distinct(split(lower(text), ' '))) AS DOUBLE) / size(split(text, ' ')))
      | + 0.25 * (CASE WHEN size(split(text, ' ')) BETWEEN 20 AND 120 THEN 1.0 ELSE 0.0 END)
      | + 0.25 * (CAST(size(filter(split(lower(text), ' '), x -> array_contains(array('the', 'a'), x))) AS DOUBLE) / size(split(text, ' ')))"""
      .stripMargin.replace("\n", " ")

  private[queries] val DuckQualityExpr =
    """0.5 * (CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE) / len(string_split(text, ' ')))
      | + 0.25 * (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 120 THEN 1.0 ELSE 0.0 END)
      | + 0.25 * (CAST(len(list_filter(string_split(lower(text), ' '), x -> list_contains(['the', 'a'], x))) AS DOUBLE) / len(string_split(text, ' ')))"""
      .stripMargin.replace("\n", " ")

  /** Persisted `(doc_id, lang, n_tokens, quality)` scored frame —
    * QualityExpr is the most expensive per-doc projection (three
    * split/lambda passes), and both quality queries consume it; one
    * copy per (session, sf dir) like the other shared frames.
    */
  private val qualityCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame])

  private[queries] def qualityDF(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables.memo(qualityCache, (Tables.sessionKey(s), d))({
      Tables.load(s, d, "documents")
        .selectExpr("doc_id", "lang", "source",
          "size(split(text, ' ')) AS n_tokens",
          s"$QualityExpr AS quality")
        .persist()
    })

  /** Persisted `(doc_id, bigram)` frame — shared by the corpus-wide
    * bigram counts and the per-doc repetition signals, one copy per
    * (session, sf dir) like the dedup shingle/word frames.
    */
  private val bigramCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame])

  private[queries] def bigramDF(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables.memo(bigramCache, (Tables.sessionKey(s), d))({
      // NOT persisted: every consumer rides the aggregated count frames
      // below, so the raw per-occurrence frame is scanned exactly once
      // (explode feeding a partial hash aggregate) when
      // [[docBigramCounts]] first materializes.
      Tables.load(s, d, "documents")
        .withColumn("w", split(lower(col("text")), " "))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(w) < 2 THEN array()
            |     ELSE transform(sequence(1, size(w) - 1),
            |            i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))
            |END""".stripMargin)).as("bigram"))
    })

  /** Persisted `(doc_id, bigram, n)` occurrence-count frame — THE one
    * corpus-sized bigram shuffle per (session, sf dir). Every bigram
    * statistic downstream (corpus vocab counts, document frequency,
    * per-doc repetition maxima, the bigram-LM join-back) is a sum/max/
    * count over this much smaller distinct-pair frame, so the r7 bench
    * finding that q_lm_bigram / q_quality_repetition / q_boilerplate
    * each re-shuffled the full per-occurrence frame cannot recur by
    * construction.
    */
  private val docBigramCountCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame])

  private[queries] def docBigramCounts(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables.memo(docBigramCountCache, (Tables.sessionKey(s), d))({
      bigramDF(s, d).groupBy("doc_id", "bigram").agg(count(lit(1)).as("n"))
        .persist()
    })

  /** Persisted corpus bigram vocabulary `(bigram, c12)` — vocab-sized,
    * derived from [[docBigramCounts]] with one small aggregate; shared
    * by q_text_bigrams, q_text_pmi and the bigram LM.
    */
  private val bigramCountCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame])

  private[queries] def bigramCounts(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables.memo(bigramCountCache, (Tables.sessionKey(s), d))({
      docBigramCounts(s, d).groupBy("bigram").agg(sum("n").as("c12"))
        .persist()
    })

  /** Persisted `(doc_id, fp)` long-gram fingerprint frame for the
    * cross-dup join — scanned three times (df cutoff + both self-join
    * sides), one copy per (session, sf dir) like the bigram frame.
    */
  private val crossFpCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame])

  private def crossFpDF(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables.memo(crossFpCache, (Tables.sessionKey(s), d))({
      graft.ops.WinnowFunctions.registerSet(s, CrossK, CrossW)
      Tables.load(s, d, "documents")
        .filter(length(col("text")) >= CrossK + CrossW - 1)
        .select(col("doc_id"),
          explode(expr("graft_winnow_set(lower(text))")).as("fp"))
        .persist()
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Single-pass corpus health audit: the per-source dashboard row every
    // ingest run needs (doc/token/char volume, exact-dup rate, language
    // spread) computed in ONE scan + one hash aggregate. All metrics are
    // exact integers (dup rate on the ppm grid), so the row is
    // hash-stable under any partitioning. At 100 TB the COUNT(DISTINCT)
    // pair shuffles 16-byte hashes, not documents — the expand+partial
    // two-phase plan Spark generates is the right one.
    "q_corpus_health" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).as("n_tokens"),
          countDistinct(md5(col("text"))).as("distinct_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("chars_total"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("distinct_docs"),
          expr("(n_docs - distinct_docs) * 1000000 DIV n_docs").as("dup_ppm"),
          col("n_langs"), col("chars_total"))
        .orderBy("source")
    }),

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
      bigramCounts(s, d)
        .select(col("bigram"), col("c12").as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    }),

    // PMI collocation extraction: the top 50 word pairs whose joint
    // probability most exceeds independence — the classic phrase-mining
    // signal. Counts ride the shared persisted word/bigram frames (two
    // hash aggregates); unigram counts broadcast back over the filtered
    // bigram vocabulary; totals are two broadcast scalar rows. The PMI
    // itself is probability ratios in fixed-shape double arithmetic,
    // FLOAT-collapsed then micro-nat-gridded so the ranking is
    // oracle-exact; a count floor keeps rare-pair noise (and log-of-
    // tiny-ratio instability) out of the verified set.
    "q_text_pmi" -> ((s, d) => {
      val wc = DedupQueries.wordDF(s, d)
        .groupBy("word").agg(count(lit(1)).as("c"))
      val n = DedupQueries.wordDF(s, d).agg(count(lit(1)).as("n"))
      val nb = bigramCounts(s, d).agg(sum("c12").as("nb"))
      val c12 = bigramCounts(s, d)
        .filter(col("c12") >= PmiMinCount)
        .withColumn("w1", expr("element_at(split(bigram, ' '), 1)"))
        .withColumn("w2", expr("element_at(split(bigram, ' '), 2)"))
      c12
        .join(broadcast(wc.select(col("word").as("w1"), col("c").as("c1"))), Seq("w1"))
        .join(broadcast(wc.select(col("word").as("w2"), col("c").as("c2"))), Seq("w2"))
        .crossJoin(broadcast(n)).crossJoin(broadcast(nb))
        .select(col("bigram"), col("c12"), expr(PmiUnatsExpr("FLOAT")).as("pmi_unats"))
        .orderBy(col("pmi_unats").desc, col("bigram"))
        .limit(50)
    }),

    // Rolling-hash document fingerprinting by winnowing: hash every
    // char k-gram, then keep the minimum hash of each w-wide window of
    // consecutive gram positions (min-of-window == the rolling
    // selection; distinct mins == the document's fingerprint set).
    // Guarantees any shared substring of length >= k+w-1 yields a
    // shared fingerprint. Plan shape: one scan -> narrow explode
    // (doc_id, pos, h) -> per-doc window (single shuffle on doc_id) ->
    // hash aggregate; at 100 TB each document's grams stay inside its
    // partition after the one exchange, nothing is quadratic.
    "q_text_winnow" -> ((s, d) => {
      // Winnowing is per-document-LOCAL, so it runs as a one-pass
      // codegen kernel (graft.ops.WinnowOps) — no explode, no per-doc
      // window shuffle, no distinct exchange. A first cut as
      // explode + substring(t, pos, k) + window-min measured 4.9 s at
      // sf0.1: substring() walks UTF-8 chars from the start (O(pos)
      // per gram, quadratic per doc) and every exploded row copied the
      // full document text. The kernel is 0 shuffles and O(doc) per
      // doc; the declarative window/explode formulation survives as
      // the DuckDB oracle replay below and pins identical values.
      graft.ops.WinnowFunctions.register(s, WinK, WinW)
      Tables.load(s, d, "documents")
        .filter(length(col("text")) >= WinK + WinW - 1)
        .select(col("doc_id"), expr("graft_winnow(lower(text))").as("fp"))
        .select(col("doc_id"), col("fp.n_fp").as("n_fp"),
          col("fp.fp_xor").as("fp_xor"))
        .orderBy("doc_id")
    }),

    // Cross-document duplicate-span detection (the fingerprint-join
    // analogue of suffix-array substring dedup): winnow each document
    // with long grams, drop high-df boilerplate fingerprints, then pair
    // documents sharing >= CrossMinShared fingerprints. The kernel keeps
    // fingerprinting a local O(doc) scan; the df cutoff bounds every
    // join key below CrossMaxDf rows before the self-join, so no
    // unbounded fan-out exists anywhere in the plan — the same shape
    // that makes q_dedup_ngram scale-safe.
    // r15 exact-text collapse: fingerprints, the boilerplate df window,
    // and pair counting all run over one rep per byte-identical text —
    // the r14 doc-level df ≤ CrossMaxDf window made a >20-doc identical
    // cluster's OWN fingerprints "boilerplate", so the cluster produced
    // zero rows (the same hole the jaccard family's cutoff had, at a
    // much lower threshold). Semantics, replayed by the oracle: a
    // DISTINCT-text pair's n_shared counts shared fingerprints whose
    // distinct-text df sits in the boilerplate window; a SAME-text pair
    // shares every fingerprint by definition, so its n_shared is the
    // text's full fingerprint count (no window — a copy of yourself is
    // copying, not boilerplate).
    "q_winnow_crossdup" -> ((s, d) => {
      graft.ops.WinnowFunctions.registerSet(s, CrossK, CrossW)
      val memb = DedupQueries.docGroupsDF(s, d)
      val big = DedupQueries.bigCorpus(s, d)
      def hb(df: org.apache.spark.sql.DataFrame) = DedupQueries.hb(df, big)
      val frep = crossFpDF(s, d)
        .join(hb(memb.filter(col("doc_id") === col("rep")).select("doc_id")),
          Seq("doc_id"), "left_semi")
      // df >= 2: a fingerprint seen in a single distinct text can't
      // cross-pair, and singletons are the overwhelming majority —
      // dropping them collapses the semi-join build side to just the
      // shared fingerprints (same pruning as DedupQueries).
      val ok = frep.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= CrossMaxDf).select("fp")
      val ff = frep.join(hb(ok), Seq("fp"), "left_semi")
      val repPairs = ff.select(col("fp"), col("doc_id").as("ra"))
        .join(ff.select(col("fp"), col("doc_id").as("rb")), Seq("fp"))
        .filter(col("ra") < col("rb"))
        .groupBy("ra", "rb").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= CrossMinShared)
      val cross = repPairs
        .join(hb(memb.select(col("rep").as("ra"), col("doc_id").as("a"))), Seq("ra"))
        .join(hb(memb.select(col("rep").as("rb"), col("doc_id").as("b"))), Seq("rb"))
        .select(least(col("a"), col("b")).as("ia"),
          greatest(col("a"), col("b")).as("ib"), col("n_shared"))
      val repCnt = frep.groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= CrossMinShared)
        .withColumnRenamed("doc_id", "rep")
      val within = memb.select(col("rep"), col("doc_id").as("a"))
        .join(hb(memb.select(col("rep"), col("doc_id").as("b"))), Seq("rep"))
        .filter(col("a") < col("b"))
        .join(hb(repCnt), Seq("rep"))
        .select(col("a").as("ia"), col("b").as("ib"), col("n_shared"))
      cross.unionByName(within).orderBy("ia", "ib")
    }),

    // Gopher-style repetition signals: fraction of tokens taken by the
    // most frequent word and by the most frequent bigram (x2 tokens).
    // High values mean degenerate/templated text a curation pipeline
    // drops. Two hash aggregates + a broadcast-size join back per doc;
    // integer counts with one double division each, so the oracle
    // matches bit-for-bit.
    "q_quality_repetition" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      val tok = docs.select(col("doc_id"), size(col("w")).as("n_tokens"))
      // Top-word counts ride the word frame DedupQueries already
      // persists for this sf dir (one explode, shared across queries).
      val topw = DedupQueries.docWordCounts(s, d)
        .groupBy("doc_id").agg(max("tf").as("top_word_n"))
      val topb = docBigramCounts(s, d)
        .groupBy("doc_id").agg(max("n").as("top_bigram_n"))
      tok.join(topw, Seq("doc_id"), "left").join(topb, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          expr("CAST(coalesce(top_word_n, 0) AS DOUBLE) / n_tokens").as("top_word_frac"),
          expr("CAST(2 * coalesce(top_bigram_n, 0) AS DOUBLE) / n_tokens").as("top_bigram_frac"))
        .withColumn("flagged",
          col("top_word_frac") > 0.125 || col("top_bigram_frac") > 0.15)
        .orderBy("doc_id")
    }),

    // Quality scoring: length band + type-token ratio + stopword ratio.
    "q_text_quality" -> ((s, d) => {
      qualityDF(s, d)
        .select("doc_id", "n_tokens", "quality")
        .orderBy("doc_id")
    }),

    // Corpus-relative quality filtering: keep documents above the CORPUS
    // MEDIAN quality — thresholds derived from the data itself, the way
    // a curation pipeline actually sets them (no magic constants). The
    // median is one aggregate row broadcast back over the scored corpus;
    // quality values are bit-identical to q_text_quality's, and Spark
    // `percentile` matches DuckDB `quantile_cont` exactly (q_percentile
    // pins this), so the comparison is deterministic.
    "q_quality_threshold" -> ((s, d) => {
      // Both sides (median aggregate + filter) read the shared persisted
      // scored frame — the expensive QualityExpr runs once per corpus.
      val scored = qualityDF(s, d)
        .select(col("doc_id"), col("lang"), col("quality").as("q"))
      val med = scored.agg(expr("percentile(q, 0.5)").as("threshold"))
      scored.crossJoin(broadcast(med))
        .filter(col("q") > col("threshold"))
        .groupBy("lang", "threshold")
        .agg(count(lit(1)).as("n_kept"), min("doc_id").as("first_id"))
        .select("lang", "n_kept", "first_id", "threshold")
        .orderBy("lang")
    }),

    // Source-fair quality normalization (the FineWeb/DCLM move): a
    // single global quality threshold silently biases the mix toward
    // whatever source the scorer likes — normalizing to PER-SOURCE
    // percentiles keeps each source's own top half instead. Keep rule
    // is exact integer math (rk*2 > n_src ⇔ strictly above the source
    // median position, rank made unique by (q, doc_id)), so no float
    // percentile is compared per row. Shape: ONE source-partitioned
    // shuffle shared by the rank and count windows (partition key =
    // shuffle key, same as q_domain_cap — a skewed mega-source sorts
    // only its own partition), the global median rides along as a
    // broadcast 1-row side purely for the bias audit columns. Output
    // shows the re-balancing: n_kept_fair is ~n/2 per source by
    // construction; n_kept_global is what the global cut would keep.
    "q_quality_norm" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = qualityDF(s, d)
        .select(col("doc_id"), col("source"), col("quality").as("q"))
      val byS = Window.partitionBy("source")
      val ranked = scored
        .withColumn("rk", row_number().over(byS.orderBy(col("q"), col("doc_id"))))
        .withColumn("n_src", count(lit(1)).over(byS))
      val med = scored.agg(expr("percentile(q, 0.5)").as("gmed"))
      ranked.crossJoin(broadcast(med))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rk") * 2 > col("n_src"), 1L).otherwise(0L))
            .as("n_kept_fair"),
          sum(when(col("q") > col("gmed"), 1L).otherwise(0L))
            .as("n_kept_global"))
        .orderBy("source")
    }),

    // Per-document lexical entropy H = ln(n) - (1/n) * sum c_w ln c_w
    // over the word distribution — the information-theoretic diversity
    // signal next to TTR (word soup scores high, copy-paste repetition
    // low). Shape: one explode + (doc, word) hash agg + per-doc hash agg
    // — no window, no sort until the final ORDER BY. Exact: each
    // c_w ln c_w term is FLOAT-collapsed onto the micro-nat grid, so the
    // per-doc sum is an order-independent BIGINT and the division is one
    // integer DIV; both engines produce identical bits.
    "q_text_entropy" -> ((s, d) => {
      DedupQueries.wordDF(s, d)
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n"), count(lit(1)).as("n_distinct"),
          sum(expr(EntUnats("c", "FLOAT"))).as("s_unats"))
        .select(col("doc_id"), col("n"), col("n_distinct"),
          // H = (n ln n - sum c ln c) / n on the micro-nat grid. The
          // GREATEST(0, _) guards the one-ulp-negative rounding case:
          // Spark DIV truncates toward zero while the oracle's // floors,
          // so a -1-micro numerator would otherwise diverge.
          expr(s"CAST(GREATEST(0, ${EntUnats("n", "FLOAT")} - s_unats) DIV n AS DOUBLE)" +
            " / CAST(1000000 AS DOUBLE)").as("entropy_nats"))
        .orderBy("doc_id")
    }),

    // Zipf slope per language: least-squares fit of ln(freq) on
    // ln(rank) over the top ZipfTop words — the standard corpus-health
    // check (natural text sits near slope -1; generated or boilerplate
    // text drifts). One scan + hash aggregate builds the frequency
    // table (vocabulary-sized, NOT corpus-sized), the rank window sorts
    // only per-language vocabularies, and the regression is exact
    // integer sums on the micro-nat grid (FLOAT-collapsed ln), so both
    // engines produce identical bits with one final double division.
    "q_text_zipf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      Tables.load(s, d, "documents")
        .select(col("lang"), explode(split(lower(col("text")), " ")).as("word"))
        .groupBy("lang", "word").agg(count(lit(1)).as("n"))
        .withColumn("r", row_number().over(Window.partitionBy("lang")
          .orderBy(col("n").desc, col("word"))))
        .filter(col("r") <= ZipfTop)
        .select(col("lang"),
          expr(ZipfUnats("r", "FLOAT")).as("x"),
          expr(ZipfUnats("n", "FLOAT")).as("y"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("lang"), col("n_words"),
          expr("CAST(n_words * sxy - sx * sy AS DOUBLE)" +
            " / CAST(n_words * sxx - sx * sx AS DOUBLE)").as("zipf_slope"))
        .orderBy("lang")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_corpus_health" ->
      """SELECT source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  COUNT(DISTINCT md5(text)) AS distinct_docs,
        |  (COUNT(*) - COUNT(DISTINCT md5(text))) * 1000000 // COUNT(*) AS dup_ppm,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_total
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
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
    "q_text_pmi" ->
      s"""WITH wd AS (SELECT UNNEST(string_split(lower(text), ' ')) AS word
         |            FROM documents),
         |wc AS (SELECT word, COUNT(*) AS c FROM wd GROUP BY word),
         |n AS (SELECT COUNT(*) AS n FROM wd),
         |d AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
         |b AS (SELECT UNNEST(list_transform(range(1, len(ws)),
         |        i -> ws[i] || ' ' || ws[i + 1])) AS bigram FROM d),
         |nb AS (SELECT COUNT(*) AS nb FROM b),
         |c12 AS (SELECT bigram, COUNT(*) AS c12,
         |          string_split(bigram, ' ')[1] AS w1,
         |          string_split(bigram, ' ')[2] AS w2
         |        FROM b GROUP BY bigram HAVING COUNT(*) >= $PmiMinCount),
         |j AS (SELECT bigram, c12, a.c AS c1, bb.c AS c2, n.n AS n, nb.nb AS nb
         |      FROM c12 JOIN wc a ON c12.w1 = a.word
         |               JOIN wc bb ON c12.w2 = bb.word
         |               CROSS JOIN n CROSS JOIN nb)
         |SELECT bigram, c12, ${PmiUnatsExpr("REAL")} AS pmi_unats
         |FROM j ORDER BY pmi_unats DESC, bigram LIMIT 50""".stripMargin,
    "q_text_winnow" -> {
      val (k, w) = (WinK, WinW)
      // DuckDB range(a, b) is stop-EXCLUSIVE (never descends), so
      // range(1, len - (k-2)) == Spark sequence(1, len - (k-1)).
      s"""WITH d AS (SELECT doc_id, lower(text) AS t FROM documents
         |           WHERE length(lower(text)) >= ${k + w - 1}),
         |g AS (SELECT doc_id, t, UNNEST(range(1, length(t) - ${k - 2})) AS pos FROM d),
         |h AS (SELECT doc_id, pos, length(t) - ${k - 1} AS ng,
         |        CAST('0x' || substr(md5(substr(t, pos, $k)), 1, 15) AS BIGINT) AS h
         |      FROM g),
         |w AS (SELECT doc_id, pos, ng,
         |        min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                     ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp
         |      FROM h),
         |f AS (SELECT DISTINCT doc_id, fp FROM w WHERE pos <= ng - ${w - 1})
         |SELECT doc_id, COUNT(*) AS n_fp, bit_xor(fp) AS fp_xor
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "q_winnow_crossdup" -> {
      val (k, w) = (CrossK, CrossW)
      // r15 exact-text collapse replay: fingerprints over one rep per
      // byte-identical text, boilerplate window on distinct-text df,
      // same-text pairs carry the text's full fingerprint count.
      s"""WITH fpr AS (SELECT doc_id, md5(lower(text)) AS tfp FROM documents),
         |grp AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY tfp) AS rep FROM fpr),
         |d AS (SELECT t.doc_id, lower(t.text) AS t FROM documents t
         |      JOIN grp gr ON t.doc_id = gr.doc_id AND gr.doc_id = gr.rep
         |      WHERE length(lower(t.text)) >= ${k + w - 1}),
         |g AS (SELECT doc_id, t, UNNEST(range(1, length(t) - ${k - 2})) AS pos FROM d),
         |h AS (SELECT doc_id, pos, length(t) - ${k - 1} AS ng,
         |        CAST('0x' || substr(md5(substr(t, pos, $k)), 1, 15) AS BIGINT) AS h
         |      FROM g),
         |w AS (SELECT doc_id, pos, ng,
         |        min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                     ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp
         |      FROM h),
         |f AS (SELECT DISTINCT doc_id, fp FROM w WHERE pos <= ng - ${w - 1}),
         |ok AS (SELECT fp FROM f GROUP BY fp HAVING COUNT(*) <= $CrossMaxDf),
         |ff AS (SELECT doc_id, fp FROM f JOIN ok USING (fp)),
         |rp AS (SELECT a.doc_id AS ra, b.doc_id AS rb, COUNT(*) AS n_shared
         |       FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2 HAVING COUNT(*) >= $CrossMinShared),
         |crossp AS (SELECT LEAST(ga.doc_id, gb.doc_id) AS ia,
         |             GREATEST(ga.doc_id, gb.doc_id) AS ib, rp.n_shared
         |           FROM rp JOIN grp ga ON ga.rep = rp.ra
         |                   JOIN grp gb ON gb.rep = rp.rb),
         |rcnt AS (SELECT doc_id AS rep, COUNT(*) AS n_shared FROM f
         |         GROUP BY doc_id HAVING COUNT(*) >= $CrossMinShared),
         |withinp AS (SELECT a.doc_id AS ia, b.doc_id AS ib, rcnt.n_shared
         |            FROM grp a JOIN grp b ON a.rep = b.rep AND a.doc_id < b.doc_id
         |            JOIN rcnt ON rcnt.rep = a.rep)
         |SELECT ia, ib, n_shared FROM
         |  (SELECT * FROM crossp UNION ALL SELECT * FROM withinp)
         |ORDER BY ia, ib""".stripMargin
    },
    "q_quality_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |tok AS (SELECT doc_id, len(w) AS n_tokens FROM d),
        |topw AS (SELECT doc_id, MAX(n) AS top_word_n FROM (
        |  SELECT doc_id, g, COUNT(*) AS n
        |  FROM (SELECT doc_id, UNNEST(w) AS g FROM d) GROUP BY doc_id, g)
        |  GROUP BY doc_id),
        |topb AS (SELECT doc_id, MAX(n) AS top_bigram_n FROM (
        |  SELECT doc_id, g, COUNT(*) AS n
        |  FROM (SELECT doc_id, UNNEST(list_transform(range(1, len(w)),
        |          i -> w[i] || ' ' || w[i + 1])) AS g FROM d) GROUP BY doc_id, g)
        |  GROUP BY doc_id),
        |j AS (SELECT tok.doc_id AS doc_id, n_tokens,
        |        CAST(COALESCE(top_word_n, 0) AS DOUBLE) / n_tokens AS top_word_frac,
        |        CAST(2 * COALESCE(top_bigram_n, 0) AS DOUBLE) / n_tokens AS top_bigram_frac
        |      FROM tok LEFT JOIN topw ON tok.doc_id = topw.doc_id
        |               LEFT JOIN topb ON tok.doc_id = topb.doc_id)
        |SELECT doc_id, n_tokens, top_word_frac, top_bigram_frac,
        |       (top_word_frac > 0.125 OR top_bigram_frac > 0.15) AS flagged
        |FROM j ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""SELECT doc_id,
         |  len(string_split(text, ' ')) AS n_tokens,
         |  $DuckQualityExpr AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality_threshold" ->
      s"""WITH s AS (SELECT doc_id, lang, $DuckQualityExpr AS q FROM documents),
         |m AS (SELECT quantile_cont(q, 0.5) AS threshold FROM s)
         |SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS first_id, threshold
         |FROM s CROSS JOIN m WHERE q > threshold
         |GROUP BY lang, threshold ORDER BY lang""".stripMargin,
    "q_quality_norm" ->
      s"""WITH s AS (SELECT doc_id, source, $DuckQualityExpr AS q FROM documents),
         |r AS (SELECT source, doc_id, q,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY q, doc_id) AS rk,
         |    COUNT(*) OVER (PARTITION BY source) AS n_src
         |  FROM s),
         |m AS (SELECT quantile_cont(q, 0.5) AS gmed FROM s)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN rk * 2 > n_src THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept_fair,
         |  CAST(SUM(CASE WHEN q > gmed THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept_global
         |FROM r CROSS JOIN m GROUP BY source ORDER BY source""".stripMargin,

    "q_text_entropy" ->
      s"""WITH wc AS (SELECT doc_id, word, COUNT(*) AS c FROM
         |    (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS word
         |     FROM documents) GROUP BY doc_id, word),
         |a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
         |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |    CAST(SUM(${EntUnats("c", "REAL")}) AS BIGINT) AS s_unats
         |  FROM wc GROUP BY doc_id)
         |SELECT doc_id, n, n_distinct,
         |  CAST(GREATEST(0, ${EntUnats("n", "REAL")} - s_unats) // n AS DOUBLE)
         |    / CAST(1000000 AS DOUBLE) AS entropy_nats
         |FROM a ORDER BY doc_id""".stripMargin,

    "q_text_zipf" ->
      s"""WITH w AS (
         |  SELECT lang, UNNEST(string_split(lower(text), ' ')) AS word
         |  FROM documents),
         |f AS (SELECT lang, word, COUNT(*) AS n FROM w GROUP BY lang, word),
         |rk AS (SELECT lang, n,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word) AS r
         |  FROM f),
         |g AS (SELECT lang, ${ZipfUnats("r", "REAL")} AS x,
         |    ${ZipfUnats("n", "REAL")} AS y
         |  FROM rk WHERE r <= $ZipfTop),
         |a AS (SELECT lang, COUNT(*) AS n_words,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx
         |  FROM g GROUP BY lang)
         |SELECT lang, n_words,
         |  CAST(n_words * sxy - sx * sy AS DOUBLE)
         |    / CAST(n_words * sxx - sx * sx AS DOUBLE) AS zipf_slope
         |FROM a ORDER BY lang""".stripMargin
  )
}
