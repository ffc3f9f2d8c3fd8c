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

  /** Portable 60-bit hash (same as DedupQueries): first (most-significant) 15 hex chars of
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

  /** Seed + audit-block size for q_train_shuffle's deterministic global
    * permutation; shared with the oracle. Changing the seed string
    * produces an entirely different (but equally reproducible) epoch
    * order — the per-epoch reshuffle is a seed bump, not new machinery.
    */
  private[queries] val ShuffleSeed = "r9seed"
  private[queries] val ShuffleBlock = 128

  /** Sample size per source for q_weighted_sample (A-ES weighted
    * sampling without replacement); shared with the oracle.
    */
  private[queries] val WeightedK = 5

  /** Character-length bucket width for q_dpo_pairs (pairs are formed
    * within same-source, same-length-band groups so the preference
    * signal is quality, not length); shared with the oracle.
    */
  private[queries] val DpoLenBucket = 100

  /** Bloom-filter geometry for q_bloom_decontam: m bits, k probes. The
    * k bit positions are DISJOINT 12-bit slices of the gram's 60-bit
    * portable hash (bits [12j, 12j+12) — the same digest-carving trick
    * as the CMS row buckets), so the filter is fully deterministic and
    * the oracle replays membership bit-for-bit.
    */
  private[queries] val BloomM = 4096
  private[queries] val BloomK = 3

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
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame])

  private def gramsDF(s: SparkSession, d: String): DataFrame =
    Tables.memo(gramCache, (Tables.sessionKey(s), d))({
      Tables.load(s, d, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
        .select(col("doc_id"), explode(expr(gramExpr(ContamN))).as("g"))
        .select(col("doc_id"), expr(h60("g")).as("h"))
        .persist()
    })

  /** Train/holdout split modulus for the weak-label quality classifier
    * (and the leakage audit's train/test sides): deterministic id-hash
    * splits, the only kind that stays stable under re-partitioning.
    */
  private[queries] val ClfIters = 6
  private[queries] val ClfLrNum = 1L
  private[queries] val ClfLrDen = 4L

  /** Persisted standardized-feature frame for the classifier:
    * `(doc_id, is_train, y1000, x0..x3)` — weak label y = "above mean
    * n_chars" in permille, features as milli-z-scores on the exact
    * integer grid (see [[graft.ops.LinearClassifier]]). Three scalar
    * statistics rows (label mean, feature means, feature stddevs) are
    * broadcast back over the scan — never a driver-side data collect.
    */
  private val clfCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame])

  /** ONE template for every classifier feature / label /
    * standardization expression, instantiated per dialect — the two
    * engines CANNOT drift (an edit to a feature lands on both sides or
    * neither). `div` is the truncating integer division spelling, the
    * rest are the list-function names that differ between dialects.
    */
  private final case class ClfDialect(
      div: String, len: String, split: String, filter: String,
      containsStops: String)

  private val ClfSpark = ClfDialect("div", "size", "split", "filter",
    "array_contains(array('the', 'a'), x)")
  private val ClfDuck = ClfDialect("//", "len", "string_split",
    "list_filter", "list_contains(['the', 'a'], x)")

  private def clfWords(dl: ClfDialect): String =
    s"CAST(${dl.len}(${dl.split}(text, ' ')) AS BIGINT)"
  private def clfR(dl: ClfDialect, j: Int): String = j match {
    case 1 => s"LEAST(${clfWords(dl)}, 500)"
    case 2 => s"(n_chars * 1000) ${dl.div} ${clfWords(dl)}"
    case 3 => s"(CAST(${dl.len}(${dl.filter}(${dl.split}(lower(text), ' '), " +
      s"x -> ${dl.containsStops})) AS BIGINT) * 1000) ${dl.div} ${clfWords(dl)}"
  }
  private def clfMean(dl: ClfDialect, j: Int): String =
    s"CAST(SUM(r$j) AS BIGINT) ${dl.div} COUNT(*)"
  private def clfStd(dl: ClfDialect, j: Int): String =
    s"GREATEST(CAST(1 AS BIGINT), CAST(FLOOR(SQRT(CAST(" +
      s"CAST(SUM((r$j - m$j) * (r$j - m$j)) AS BIGINT) ${dl.div} COUNT(*) " +
      s"AS DOUBLE))) AS BIGINT))"
  private def clfZ(dl: ClfDialect, j: Int): String =
    s"((r$j - m$j) * 1000) ${dl.div} s$j"
  private val ClfLabel =
    "CASE WHEN n_chars * n > sc THEN CAST(1000 AS BIGINT) " +
      "ELSE CAST(0 AS BIGINT) END"
  private val ClfSplit = "doc_id % 5 < 4"

  private def clfFeaturesDF(s: SparkSession, d: String): DataFrame =
    Tables.memo(clfCache, (Tables.sessionKey(s), d))({
      val dl = ClfSpark
      val raw = Tables.load(s, d, "documents").select(
        col("doc_id"), col("source"), col("n_chars"),
        expr(clfR(dl, 1)).as("r1"),
        expr(clfR(dl, 2)).as("r2"),
        expr(clfR(dl, 3)).as("r3"))
      val lbl = raw.agg(
        count(lit(1)).cast("long").as("n"),
        sum("n_chars").cast("long").as("sc"))
      val raw2 = raw.crossJoin(broadcast(lbl))
        .withColumn("y1000", expr(ClfLabel))
      val st1 = raw2.agg(
        expr(clfMean(dl, 1)).as("m1"),
        expr(clfMean(dl, 2)).as("m2"),
        expr(clfMean(dl, 3)).as("m3"))
      val withM = raw2.crossJoin(broadcast(st1))
      val st2 = withM.agg(
        expr(clfStd(dl, 1)).as("s1"), expr(clfStd(dl, 2)).as("s2"),
        expr(clfStd(dl, 3)).as("s3"))
      withM.crossJoin(broadcast(st2)).select(
        col("doc_id"), col("source"),
        expr(ClfSplit).as("is_train"),
        col("y1000"),
        expr("CAST(1000 AS BIGINT)").as("x0"),
        expr(clfZ(dl, 1)).as("x1"),
        expr(clfZ(dl, 2)).as("x2"),
        expr(clfZ(dl, 3)).as("x3"))
        .persist()
    })

  private val clfWCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap
    .empty[(Int, String), Array[Long]])

  /** Trained classifier weights, memoized per (session, sf dir): the
    * training replay is DETERMINISTIC on the exact integer grid
    * (partitioning-invariant), so "the stored model" and "retrain" are
    * the same four numbers — train once per corpus, score everywhere,
    * exactly the serving pattern the incremental query describes. The
    * per-invocation cost it removes is ClfIters driver round-trips
    * (one aggregate + Catalyst planning each).
    */
  private def clfTrainedWeights(s: SparkSession, d: String): Array[Long] =
    Tables.memo(clfWCache, (Tables.sessionKey(s), d))({
      graft.ops.LinearClassifier.train(
        clfFeaturesDF(s, d), Seq("x0", "x1", "x2", "x3"),
        "y1000", "is_train", ClfIters, ClfLrNum, ClfLrDen)
    })

  private val lmUniVocabCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap
    .empty[(Int, String), DataFrame])
  private val lmBiScoredCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap
    .empty[(Int, String), DataFrame])

  /** Trained unigram LM `(word, unats)`, persisted once per (session,
    * sf dir) — the clfTrainedWeights discipline for the LM family:
    * training (vocab aggregate + token-total window) runs once per
    * corpus; every scoring invocation only broadcasts the persisted
    * language-sized table and aggregates per document.
    */
  private def lmUniVocab(s: SparkSession, d: String): DataFrame =
    Tables.memo(lmUniVocabCache, (Tables.sessionKey(s), d))({
      graft.ops.Curation.lmUnigramVocab(
        DedupQueries.docWordCounts(s, d)).persist()
    })

  /** Trained bigram LM `(bigram, unats)`, persisted once per (session,
    * sf dir). Bigram-vocab-sized (grows with the corpus, not
    * broadcast-assumed) — scoring joins it back with a plain equi-join.
    */
  private def lmBiScored(s: SparkSession, d: String): DataFrame =
    Tables.memo(lmBiScoredCache, (Tables.sessionKey(s), d))({
      val nVocab = DedupQueries.docWordCounts(s, d).select("word").distinct()
        .agg(count(lit(1)).as("v"))
      graft.ops.Curation.lmBigramScored(
        TextQueries.bigramCounts(s, d), nVocab).persist()
    })

  /** The same feature/label/standardization pipeline as
    * [[clfFeaturesDF]], instantiated from the SAME template in the
    * oracle dialect as a WITH-chain prefix (`raw2`, `st1`, `st2`, `f`).
    */
  private def clfOracleFeatureCtes: String = {
    val dl = ClfDuck
    s"""raw AS MATERIALIZED (SELECT doc_id, source, n_chars,
       |  ${clfR(dl, 1)} AS r1,
       |  ${clfR(dl, 2)} AS r2,
       |  ${clfR(dl, 3)} AS r3
       |FROM documents),
       |lbl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |               CAST(SUM(n_chars) AS BIGINT) AS sc FROM raw),
       |raw2 AS (SELECT raw.*, $ClfLabel AS y1000
       |FROM raw, lbl),
       |st1 AS (SELECT ${clfMean(dl, 1)} AS m1,
       |  ${clfMean(dl, 2)} AS m2,
       |  ${clfMean(dl, 3)} AS m3 FROM raw2),
       |st2 AS (SELECT ${clfStd(dl, 1)} AS s1, ${clfStd(dl, 2)} AS s2,
       |  ${clfStd(dl, 3)} AS s3 FROM raw2, st1),
       |f AS MATERIALIZED (SELECT doc_id, source, $ClfSplit AS is_train, y1000,
       |  CAST(1000 AS BIGINT) AS x0,
       |  ${clfZ(dl, 1)} AS x1,
       |  ${clfZ(dl, 2)} AS x2,
       |  ${clfZ(dl, 3)} AS x3
       |FROM raw2, st1, st2)""".stripMargin
  }

  /** The training recursion unrolled to a CTE chain: p-stages carry the
    * weights as constant columns, w-stages fold one full-batch gradient
    * step (MAX over a constant column reads it back). Mirrors
    * [[graft.ops.LinearClassifier.train]] exactly — same truncating
    * BIGINT grid, `//` == Spark `div` == Scala `/` (all toward zero).
    */
  /** Drift alarm threshold for q_classifier_incremental (permille of
    * high-quality rate difference between batch and corpus).
    */
  private[queries] val ClfDriftPermille = 100L

  /** The unrolled training chain up to the final scored frame
    * `p{ClfIters}` — the shared prefix of both classifier oracles.
    */
  private def clfOracleChain: String = {
    def pstage(k: Int): String =
      s"""p$k AS (SELECT f.*, w.w0 AS pw0, w.w1 AS pw1, w.w2 AS pw2,
         |  w.w3 AS pw3,
         |  GREATEST(CAST(0 AS BIGINT), LEAST(CAST(1000 AS BIGINT),
         |    500 + (((w.w0*x0 + w.w1*x1 + w.w2*x2 + w.w3*x3) // 1000000)
         |           // 4))) AS p
         |FROM f, w$k w)""".stripMargin
    def wstage(k: Int): String = {
      val upd = (0 to 3).map(j =>
        s"MAX(pw$j) + ($ClfLrNum * (CAST(SUM(CASE WHEN is_train THEN " +
          s"(y1000 - p) * x$j END) AS BIGINT) // " +
          s"COUNT(CASE WHEN is_train THEN 1 END))) // $ClfLrDen AS w$j")
        .mkString(", ")
      s"w$k AS (SELECT $upd FROM p${k - 1})"
    }
    val ctes = Seq(clfOracleFeatureCtes,
      "w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, " +
        "CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3)") ++
      (0 until ClfIters).flatMap(k => Seq(pstage(k), wstage(k + 1))) :+
      pstage(ClfIters)
    ctes.mkString(",\n")
  }

  private def clfOracleSql: String =
    s"""WITH $clfOracleChain
       |SELECT is_train, y1000 // 1000 AS y,
       |  CAST(CASE WHEN p >= 500 THEN 1 ELSE 0 END AS BIGINT) AS pred,
       |  COUNT(*) AS n, MAX(pw0) AS w0, MAX(pw1) AS w1, MAX(pw2) AS w2,
       |  MAX(pw3) AS w3
       |FROM p$ClfIters GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  private def clfIncrementalOracleSql: String =
    s"""WITH $clfOracleChain,
       |sc AS (SELECT p$ClfIters.*,
       |  ${duckH60("CAST(doc_id AS VARCHAR)")} % 10 = 7 AS in_batch
       |FROM p$ClfIters),
       |agg AS (SELECT source,
       |  COUNT(CASE WHEN in_batch THEN 1 END) AS n_batch,
       |  COUNT(CASE WHEN in_batch AND p >= 500 THEN 1 END) AS hi_batch,
       |  COUNT(CASE WHEN NOT in_batch THEN 1 END) AS n_corpus,
       |  COUNT(CASE WHEN NOT in_batch AND p >= 500 THEN 1 END) AS hi_corpus
       |FROM sc GROUP BY source)
       |SELECT source, n_batch,
       |  (hi_batch * 1000) // NULLIF(n_batch, 0) AS hi_batch_permille,
       |  n_corpus,
       |  (hi_corpus * 1000) // NULLIF(n_corpus, 0) AS hi_corpus_permille,
       |  CASE WHEN n_corpus = 0 THEN CAST(1000 AS BIGINT)
       |    ELSE abs((hi_batch * 1000) // NULLIF(n_batch, 0)
       |      - (hi_corpus * 1000) // NULLIF(n_corpus, 0)) END AS drift_permille,
       |  CASE WHEN n_corpus = 0 THEN CAST(1000 AS BIGINT)
       |    ELSE abs((hi_batch * 1000) // NULLIF(n_batch, 0)
       |      - (hi_corpus * 1000) // NULLIF(n_corpus, 0)) END
       |    >= $ClfDriftPermille AS drifted
       |FROM agg WHERE n_batch > 0 ORDER BY source""".stripMargin

  /** Train/test split moduli for the leakage audit. */
  private[queries] val LeakMod = 10
  private[queries] val LeakTestFrom = 8

  /** BM25 parameters and the probe query terms. */
  private val Bm25K1 = "1.2"
  private val Bm25B = "0.75"
  private[queries] val Bm25Terms = Seq("join", "window", "hash")

  /** The PII redaction chain over a string SQL expression, generated
    * from [[graft.ops.Curation.DefaultPatterns]] — the SINGLE source of
    * the patterns, so editing the library surface cannot drift from the
    * oracle replay. The 'g' flag is spelled explicitly: since the
    * dialect registry implements DuckDB's regexp_replace semantics
    * (first-match-only default), the SAME text now runs replace-all on
    * both engines.
    */
  private[queries] def redactChain(c: String, flags: String = "g"): String = {
    val f = if (flags.isEmpty) "" else s", '$flags'"
    graft.ops.Curation.DefaultPatterns.foldLeft(c) { case (acc, (re, repl)) =>
      s"regexp_replace($acc, '$re', '$repl'$f)"
    }
  }

  /** Per-pattern match-count SQL, same single pattern source. */
  private def piiCountSql(c: String, lenFn: String): Seq[String] =
    graft.ops.Curation.DefaultPatterns.map { case (re, _) =>
      s"$lenFn(regexp_extract_all($c, '$re'))"
    }

  /** The synthetic corpus carries no PII, so the redaction operator runs
    * over text with deterministic PII-like tokens injected from the
    * row's own columns — both engines build the identical string, then
    * both run the identical redaction chain over it. The email is
    * deliberately MIXED-CASE so the oracle gate exercises the `(?i)`
    * case-folding path of [[graft.ops.Curation.DefaultPatterns]], not
    * just pre-lowercased input. `castStr` differs only in the dialects'
    * string type keyword.
    */
  private def piiText(castStr: String): String =
    "'User.' || doc_id || '@Mail-' || lang || '.Com call 555-' || " +
      s"lpad(CAST(doc_id % 10000 AS $castStr), 4, '0') || " +
      "' ip 10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256) || ' ' || text"

  /** Boilerplate set size: the K most document-frequent bigrams. A
    * rank-based cutoff (vs a relative-df threshold) keeps the flagged
    * set EXACTLY K rows at any corpus size — the broadcast side of the
    * join-back is bounded by construction, which is what makes this
    * shape safe at 100 TB.
    */
  private[queries] val BoilerK = 25

  /** Target mixture for domain reweighting: the five head sources get
    * 10% each, the remaining mass spreads evenly over the tail. Every
    * literal goes through an explicit DOUBLE cast — a bare `0.10`
    * parses as DECIMAL in both dialects and decimal/double arithmetic
    * mixes differently between engines.
    */
  private val MixTargetExpr =
    "CASE WHEN source IN ('src0', 'src1', 'src2', 'src3', 'src4') " +
      "THEN CAST(0.10 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) / 30 END"

  /** Max documents any single source may contribute (domain cap). */
  private[queries] val DomainCap = 15L

  // Unigram-LM surprisal grid (micro-nats): the expression lives in
  // graft.ops.Curation.unatsExpr — one definition serves the Spark plan
  // (FLOAT) and the oracle replay (REAL).

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benchmark decontamination: flag every training document sharing at
    // least one word ContamN-gram with the benchmark set. The benchmark
    // side is small BY DEFINITION (it's an eval set), so it broadcasts:
    // the 100 TB training side is scanned once with a map-side hash join
    // — no shuffle of the corpus, no skew exposure (gram hashes repeat
    // only as often as grams repeat inside the tiny benchmark).
    "q_decontaminate" -> ((s, d) => {
      val grams = gramsDF(s, d)
      graft.ops.Curation.decontaminateFromGrams(
          grams.filter(col("doc_id") % BenchMod =!= 0),
          grams.filter(col("doc_id") % BenchMod === 0)
            .select(col("doc_id").as("bench_id"), col("h")),
          idCol = "doc_id", benchIdCol = "bench_id")
        .orderBy("doc_id")
    }),

    // Bloom-filter decontamination: the scale path of q_decontaminate.
    // At 100 TB you do not ship the benchmark GRAM SET to every task —
    // you ship its m-bit Bloom filter. Here the filter is relational
    // (its set-bit positions, <= BloomM rows REGARDLESS of corpus size,
    // broadcast to the scan); a gram is bloom-positive iff all BloomK
    // position probes hit. The exact membership join rides along so the
    // verified output exposes the filter's one-sided error contract:
    // n_bloom >= n_exact always (no false negatives — the per-gram test
    // is matched-probes = total-probes, robust to repeated gram hashes;
    // see Curation.bloomDecontamFromGrams), with hash collisions
    // visible wherever n_bloom > n_exact.
    "q_bloom_decontam" -> ((s, d) => {
      val grams = gramsDF(s, d)
      graft.ops.Curation.bloomDecontamFromGrams(
          grams.filter(col("doc_id") % BenchMod =!= 0),
          grams.filter(col("doc_id") % BenchMod === 0),
          idCol = "doc_id", bloomM = BloomM, bloomK = BloomK)
        .orderBy("doc_id")
    }),

    // Bigram language-model surprisal: the natural upgrade of
    // q_lm_unigram — add-one-smoothed P(w2|w1) trained on the corpus
    // itself. Everything folds out of the shared persisted
    // (doc_id, bigram, n) count frame: c12/c1 are vocab-sized
    // aggregates over it, and the scored bigram table joins back over
    // the same distinct-pair frame with a plain equi-join (bigram
    // vocabulary is NOT assumed broadcast-sized at 100 TB). Integer
    // micro-nat sums (n * unats) keep the per-doc totals exact; ppl is
    // one exp() collapsed to FLOAT.
    "q_lm_bigram" -> ((s, d) => {
      val nVocab = DedupQueries.docWordCounts(s, d).select("word").distinct()
        .agg(count(lit(1)).as("v"))
      graft.ops.Curation.lmBigramFromCounts(
          TextQueries.docBigramCounts(s, d), "doc_id", nVocab,
          vocabCounts = Some(TextQueries.bigramCounts(s, d)),
          scoredTable = Some(lmBiScored(s, d)))
        .orderBy("doc_id")
    }),

    // Stratified deterministic sampling: per-language keep rates out of
    // 20, selected by the portable 60-bit hash of the key — reproducible
    // on any cluster, no rand(), and counted with a single hash
    // aggregate (the stratum column is data, not a shuffle key change).
    // Weak-label quality classifier (the fastText/DCLM bootstrap
    // pattern): heuristic labels -> standardized integer features ->
    // distributed full-batch gradient descent with a hard-sigmoid link
    // -> score the whole corpus. The driver holds ONLY the 4-long
    // weight vector; each iteration is one 5-value aggregate over the
    // persisted feature frame (map-side partial combine, scalar row
    // back). Everything lives on an exact truncating-BIGINT grid, so
    // the trained weights — exposed as output columns — are
    // bit-identical to the oracle's unrolled replay regardless of
    // partitioning or reduction order (see ops/LinearClassifier).
    "q_quality_classifier" -> ((s, d) => {
      val feats = clfFeaturesDF(s, d)
      val cols = Seq("x0", "x1", "x2", "x3")
      val w = clfTrainedWeights(s, d)
      val p = graft.ops.LinearClassifier.predictExpr(cols, w.toSeq)
      feats.select(col("is_train"),
          expr("y1000 div 1000").as("y"),
          expr(s"CAST(CASE WHEN ($p) >= 500 THEN 1 ELSE 0 END AS BIGINT)")
            .as("pred"))
        .groupBy("is_train", "y", "pred").agg(count(lit(1)).as("n"))
        .withColumn("w0", lit(w(0))).withColumn("w1", lit(w(1)))
        .withColumn("w2", lit(w(2))).withColumn("w3", lit(w(3)))
        .orderBy("is_train", "y", "pred")
    }),

    // Incremental classifier application + score-drift monitor: the
    // deterministic training replays to the SAME weights (partitioning-
    // invariant integer grid), so "apply the stored model to a new
    // batch" and "retrain and apply" are the same numbers. The batch is
    // a HASH slice of doc ids (not a modulus — the testdata's doc_id
    // stride aliases with source, and a drift monitor needs batch AND
    // corpus rows in every source). Per-source high-quality rates of
    // batch vs corpus and their absolute drift, the alarm that catches
    // a crawl snapshot whose quality distribution shifted before it
    // contaminates the mix. One scoring pass over the persisted feature
    // frame + one hash aggregate; all rates on the exact permille grid.
    "q_classifier_incremental" -> ((s, d) => {
      val feats = clfFeaturesDF(s, d)
      val cols = Seq("x0", "x1", "x2", "x3")
      val w = clfTrainedWeights(s, d)
      val p = graft.ops.LinearClassifier.predictExpr(cols, w.toSeq)
      val scored = feats.withColumn("p", expr(p))
        .withColumn("in_batch",
          expr(s"${h60("CAST(doc_id AS STRING)")} % 10 = 7"))
      scored.groupBy("source").agg(
          count(when(col("in_batch"), 1)).as("n_batch"),
          count(when(col("in_batch") && col("p") >= 500, 1)).as("hi_batch"),
          count(when(!col("in_batch"), 1)).as("n_corpus"),
          count(when(!col("in_batch") && col("p") >= 500, 1)).as("hi_corpus"))
        .filter(col("n_batch") > 0)
        .select(col("source"), col("n_batch"),
          expr("(hi_batch * 1000) div NULLIF(n_batch, 0)")
            .as("hi_batch_permille"),
          col("n_corpus"),
          expr("(hi_corpus * 1000) div NULLIF(n_corpus, 0)")
            .as("hi_corpus_permille"),
          // a source with NO corpus baseline is the STRONGEST drift
          // case (a brand-new source arriving in the batch) — maximal
          // drift, never a silent NULL that downstream filters drop
          expr("CASE WHEN n_corpus = 0 THEN CAST(1000 AS BIGINT) " +
            "ELSE abs((hi_batch * 1000) div NULLIF(n_batch, 0) " +
            "- (hi_corpus * 1000) div NULLIF(n_corpus, 0)) END")
            .as("drift_permille"))
        .withColumn("drifted", col("drift_permille") >= ClfDriftPermille)
        .orderBy("source")
    }),

    // Cross-split contamination audit: which held-out (test-split)
    // documents share a word n-gram with the training split? Unlike
    // q_decontaminate's tiny-benchmark broadcast, BOTH sides here are
    // corpus-sized at 100 TB, so the membership test is an equi-join on
    // the 60-bit gram hash with NO forced broadcast — the train side
    // deduplicated to its gram VOCABULARY first (one row per distinct
    // gram, the standard bound before a containment join), then
    // aggregated per test doc. Catalyst broadcasts the vocab only while
    // it fits the size threshold (it does at bench SF) and falls back
    // to a shuffle join beyond; gram-hash keys distribute uniformly, so
    // no skew handling is needed beyond AQE's defaults.
    "q_split_leakage" -> ((s, d) => {
      val grams = gramsDF(s, d)
      val trainVocab = grams
        .filter(col("doc_id") % LeakMod < LeakTestFrom)
        .select("h").distinct().withColumn("hit", lit(1))
      grams.filter(col("doc_id") % LeakMod >= LeakTestFrom)
        .join(trainVocab, Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_leaked"))
        .withColumn("leak_permille",
          expr("(n_leaked * 1000) div n_grams"))
        .withColumn("leaked", col("n_leaked") > 0)
        .orderBy("doc_id")
    }),

    // Token-budget corpus selection: spend a fixed token budget (60% of
    // the corpus here) on the highest-quality documents — the greedy
    // step of quality-weighted data selection. Greedy-by-quality is a
    // global prefix-sum problem; the cumulative token count runs
    // through ops/PrefixSum (range partition + per-partition offsets,
    // NO single-partition window), so the plan holds at 100 TB where a
    // global ORDER BY window would serialize on one task. The sort key
    // packs (quality desc, doc_id) into one BIGINT so range
    // partitioning has a single well-ordered column. The budget is one
    // scalar aggregate row broadcast back; the keep rule is exact
    // integer arithmetic (cum_before + n_tokens <= budget).
    "q_token_budget_select" -> ((s, d) => {
      // Rides the shared persisted quality frame (TextQueries.qualityDF)
      // instead of re-evaluating the three-lambda quality expression
      // over the corpus — FLOOR over the same cached double is
      // bit-identical to inlining the expression.
      val scored = TextQueries.qualityDF(s, d).select(
        col("doc_id"), col("lang"),
        col("n_tokens").cast("long").as("n_tokens"),
        expr("CAST(FLOOR(quality * 1000) AS BIGINT)").as("qp"))
        .withColumn("skey",
          expr("(1000 - qp) * 1099511627776 + doc_id"))
      // No separate budget pass: with the suffix sum from the SAME
      // window pass, total = cb + nt + ca, and for positive integers
      // a <= (6*total) div 10  <=>  10a <= 6*total, so
      // kept <=> 10*(cb+nt) <= 6*(cb+nt+ca) <=> 2*(cb+nt) <= 3*ca —
      // exact, and the grand total never has to be broadcast back.
      graft.ops.PrefixSum.runningBeforeAfter(scored, "skey", "n_tokens")
        .withColumn("kept",
          expr("2 * (cum_before + n_tokens) <= 3 * cum_after"))
        .groupBy("lang").agg(
          count(lit(1)).as("n_total"),
          count(when(col("kept"), 1)).as("n_kept"),
          sum(when(col("kept"), col("n_tokens"))).cast("long")
            .as("tokens_kept"),
          min(when(col("kept"), col("doc_id"))).as("first_kept"))
        .orderBy("lang")
    }),

    "q_stratified_sample" -> ((s, d) => {
      val rate = """CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 4 WHEN 'es' THEN 5
                   |     WHEN 'fr' THEN 8 WHEN 'zh' THEN 10 ELSE 3 END""".stripMargin
      Tables.load(s, d, "documents")
        .withColumn("kept",
          graft.ops.Curation.hashKeep("doc_id", expr(rate), outOf = 20))
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
    }),

    // PII redaction: email → phone → IPv4 regexp_replace chain (fixed
    // order, both engines), plus per-kind match counts on the raw text.
    // Pure codegen string expressions over one scan — no shuffle at all;
    // at 100 TB this is the map-only pass a privacy scrub runs before
    // anything else. The redacted text itself is reported as md5 + length
    // to keep the verified row narrow.
    "q_pii_redact" -> ((s, d) => {
      val counts = graft.ops.Curation.piiCounts(col("s"))
      val red = graft.ops.Curation.redactPii(col("s"))
      Tables.load(s, d, "documents")
        .withColumn("s", expr(piiText("STRING")))
        .select(col("doc_id"),
          counts(0).as("n_email"), counts(1).as("n_phone"), counts(2).as("n_ip"),
          md5(red).as("redacted_fp"),
          length(red).as("n_redacted_chars"))
        .orderBy("doc_id")
    }),

    // C4-style boilerplate flagging: the BoilerK most document-frequent
    // bigrams are "boilerplate"; each doc reports how much of it is made
    // of them. Document frequency is one row-count over the shared
    // persisted (doc_id, bigram, n) count frame, then a K-row broadcast
    // join back over the same frame — the corpus itself never shuffles,
    // and the flagged set is bounded at K regardless of corpus size.
    "q_boilerplate" -> ((s, d) => {
      // Delegates to the Curation API over the shared persisted bigram
      // count frame (one explode+aggregate for this sf dir, shared
      // across queries). ADJUDICATED 2-job floor (verdict r14 item 1,
      // r15): the shape is train-then-score — the top-K bigram set
      // must exist before any document can be scored (the same
      // boundary as q_lm_bigram's adjudicated floor), so job 1 builds
      // the K-row broadcast (df aggregate + TakeOrdered) and job 2
      // scores the count frame (one broadcast join + one doc-keyed
      // aggregate + output sort). The candidate fold was MEASURED AND
      // REJECTED at gate scale: boilerplateFoldedFromCounts (kept
      // below for the 100 TB path) derives per-doc totals map-only
      // and aggregates only K-matched rows, but that makes the
      // flagged-mass aggregate a THIRD sequential broadcast-build job
      // — isolated 0.505/0.559 s vs this shape's 0.351-0.397 s
      // four-run isolated band at sf0.1, where per-job scheduling
      // floors dominate the 950k-row aggregate the fold saves. See
      // the PLANS.md floor note for the full re-timed band.
      graft.ops.Curation.boilerplateFromCounts(
          TextQueries.docBigramCounts(s, d), "doc_id", BoilerK)
        .orderBy("doc_id")
    }),

    // Unigram language-model surprisal (perplexity proxy): train the LM
    // from the corpus itself (one hash aggregate), broadcast the scored
    // vocabulary back over the word frame, and sum integer micro-nats
    // per document. The vocabulary after frequency pruning is broadcast-
    // sized even at 100 TB (it grows with the language, not the corpus);
    // the per-doc sum is exact BIGINT so no float-order hazard exists,
    // and the final perplexity is one exp() collapsed to FLOAT.
    "q_lm_unigram" -> ((s, d) => {
      // Delegates to the Curation API over the shared persisted
      // (doc_id, word, tf) count frame the dedup/tf-idf family already
      // maintains for this sf dir — both LM passes then run over
      // distinct (doc, word) rows instead of raw occurrences.
      graft.ops.Curation.lmUnigramFromCounts(
          DedupQueries.docWordCounts(s, d), "doc_id",
          scoredVocab = Some(lmUniVocab(s, d)))
        .orderBy("doc_id")
    }),

    // Domain mixture reweighting: given a target mixture over sources,
    // derive the per-source keep rate that reaches the target with
    // maximum data retention (the most under-sampled source keeps 100%,
    // everything else downsamples proportionally). Two broadcast-sized
    // aggregates (per-source counts, then the max ratio) joined back —
    // the corpus is only ever scanned and hash-aggregated, and every
    // arithmetic step is a single IEEE double op, so the oracle matches
    // bit-for-bit with no float-sum-order hazard.
    "q_source_mix" -> ((s, d) => {
      graft.ops.Curation.mixtureWeights(
          Tables.load(s, d, "documents"), "source",
          targets = Seq("src0", "src1", "src2", "src3", "src4")
            .map(_ -> 0.10).toMap,
          defaultTarget = 1.0 / 30)
        .orderBy("source")
    }),

    // Output shard planning: the deterministic hash-shard assignment a
    // training-data write uses (shard = portable hash % 64), audited as
    // per-shard row/byte counts. One hash aggregate; the same expression
    // feeds `.write.partitionBy("shard")` in the sink path (SinkSpec),
    // where 64 balanced shards ARE the write parallelism at 100 TB.
    "q_shard_plan" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .withColumn("shard", graft.ops.Curation.shardAssign("doc_id", 64))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("n_bytes"),
          min("doc_id").as("first_id"))
        .orderBy("shard")
    }),

    // Deterministic seeded global training order — the epoch shuffle a
    // dataloader needs: every doc gets an EXACT global position in a
    // pseudo-random permutation keyed by (seed, doc_id), so any worker
    // can recompute any shard of the order independently and resumption
    // is "start at position p", no shuffle file manifest required. The
    // scale shape is the point: a naive ROW_NUMBER() OVER (ORDER BY hk)
    // funnels 100 TB through ONE task; here PrefixSum range-partitions
    // on the hash key and assigns positions with per-partition windows
    // plus a partitions-sized offset table (ops/PrefixSum.scala). The
    // struct order key (hk, doc_id) is collision-proof — PrefixSum
    // requires a unique order column. Output is a block-level audit
    // (counts + contiguity bounds + a modular position⊗id checksum that
    // pins EVERY position, bounded ≤ 2^60/block even at 10^12 docs).
    "q_train_shuffle" -> ((s, d) => {
      val keyed = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          expr(h60(s"concat('$ShuffleSeed:', CAST(doc_id AS STRING))")).as("hk"))
        .withColumn("_ord", struct(col("hk"), col("doc_id")))
        .withColumn("one", lit(1L))
      graft.ops.PrefixSum.runningBefore(keyed, "_ord", "one")
        .withColumn("pos", col("cum_before"))
        .groupBy(expr(s"pos DIV $ShuffleBlock").as("block"))
        .agg(count(lit(1)).as("n"),
          min("pos").as("pos_lo"), max("pos").as("pos_hi"),
          sum(expr("(pos % 1000003) * (doc_id % 1000003)")).as("checksum"))
        .orderBy("block")
    }),

    // Per-source document caps (the Common-Crawl-style domain balancer):
    // every source keeps at most DomainCap docs, selected by the
    // deterministic portable hash so the survivors are a uniform,
    // cluster-reproducible sample of the source — no rand(), no
    // quality-model coupling. One window partitioned by source (the
    // partition key IS the shuffle key, so at 1000 executors each
    // source sorts locally; a skewed mega-source sorts only its own
    // partition and the cap bounds what survives). Output audits the
    // cap: per-source totals, kept counts, and the hash-order head.
    "q_domain_cap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ranked = Tables.load(s, d, "documents")
        .withColumn("rk", row_number().over(
          Window.partitionBy("source")
            .orderBy(expr(h60("CAST(doc_id AS STRING)")), col("doc_id"))))
      ranked.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          count(when(col("rk") <= DomainCap, 1)).as("n_kept"),
          min(when(col("rk") === 1, col("doc_id"))).as("cap_head"))
        .orderBy("source")
    }),

    // Composed curation funnel, end-to-end as ONE declarative job:
    // domain cap (hash-least DomainCap per source) -> benchmark
    // decontamination (drop eval docs and anything sharing a ContamN-gram
    // with them, bench grams broadcast) -> per-source survivor counts and
    // whitespace token budget. The funnel audit (n_docs -> n_capped ->
    // n_clean -> n_tokens) is what a training-mix owner actually reads
    // before a run. Catalyst fuses the stages; the corpus is scanned
    // once for the cap window and once for grams (the gram frame is the
    // shared persisted one), and every per-source frame is
    // source-cardinality-sized and broadcast.
    "q_pipeline_curate" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, d, "documents")
      val capped = docs
        .withColumn("rk", row_number().over(
          Window.partitionBy("source")
            .orderBy(expr(h60("CAST(doc_id AS STRING)")), col("doc_id"))))
        .filter(col("rk") <= DomainCap)
      val grams = gramsDF(s, d)
      val contaminated = grams.filter(col("doc_id") % BenchMod =!= 0)
        .join(broadcast(grams.filter(col("doc_id") % BenchMod === 0)
          .select("h")), Seq("h"))
        .select("doc_id").distinct()
      val clean = capped
        .filter(col("doc_id") % BenchMod =!= 0)
        .join(contaminated.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
      val stats = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      val cappedStats = capped.groupBy("source").agg(count(lit(1)).as("n_capped"))
      val cleanStats = clean.groupBy("source").agg(
        count(lit(1)).as("n_clean"),
        sum(size(split(lower(col("text")), " "))).as("n_tokens"))
      stats.join(broadcast(cappedStats), Seq("source"))
        .join(broadcast(cleanStats), Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("n_capped"),
          coalesce(col("n_clean"), lit(0L)).as("n_clean"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
        .orderBy("source")
    }),

    // Temperature-based mixture sampling (alpha = 0.5): per-source
    // weights n^alpha re-balance a skewed corpus toward rarer sources,
    // the standard multilingual/multi-source training-mix move. The
    // sqrt is collapsed to FLOAT and rounded to a micro-int so every
    // downstream step (share, per-doc rate, cap) is exact BIGINT
    // arithmetic — order-independent and replayed digit-for-digit by
    // the oracle. Sampling itself is the deterministic hash-keep
    // predicate at rate_ppm out of 1e6: one broadcast of the per-source
    // rate table over the corpus scan, no rand(), reproducible on any
    // cluster. Output = the mixture plan plus realized sample counts.
    // (Bound: share_ppm * (tot_docs/2) stays under 2^63 up to ~9e12
    // docs — far past any real corpus row count.)
    "q_mix_temperature" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val stats = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .withColumn("s_micro",
          expr("CAST(ROUND(CAST(sqrt(CAST(n_docs AS DOUBLE)) AS FLOAT)" +
            " * CAST(1000000 AS DOUBLE)) AS BIGINT)"))
      val tot = stats.agg(sum("s_micro").as("tot_micro"),
        sum("n_docs").as("tot_docs"))
      val rated = stats.crossJoin(broadcast(tot))
        .withColumn("share_ppm", expr("(s_micro * 1000000) DIV tot_micro"))
        .withColumn("rate_ppm",
          expr("LEAST(1000000L, (share_ppm * (tot_docs DIV 2)) DIV n_docs)"))
      val kept = docs
        .join(broadcast(rated.select("source", "rate_ppm")), Seq("source"))
        .filter(graft.ops.Curation.hashKeep("doc_id", col("rate_ppm"), outOf = 1000000))
        .groupBy("source").agg(count(lit(1)).as("n_sampled"))
      rated.join(broadcast(kept), Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("share_ppm"), col("rate_ppm"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
        .orderBy("source")
    }),

    // Weighted sampling without replacement (A-ES, Efraimidis–Spirakis):
    // per source, keep the WeightedK docs with the largest u^(1/w) —
    // equivalently the largest ln(u)/w, the form used here — with
    // w = n_chars and u the portable 60-bit hash normalized to (0,1).
    // One scan computes every key (no per-group state), a per-group
    // top-k window takes the winners; at 100 TB the window becomes a
    // `graft_top_k` aggregate (O(k) state, no per-group sort), but the
    // ordering — and therefore the sample — is identical. Deterministic:
    // the ln is FLOAT-collapsed before the one exact double division.
    "q_weighted_sample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          expr("CAST(CAST(ln(CAST(" + h60("CAST(doc_id AS STRING)") +
            " AS DOUBLE) / 1152921504606846976.0) AS FLOAT) AS DOUBLE)" +
            " / CAST(n_chars AS DOUBLE)").as("es_key"))
        .withColumn("rn", row_number().over(Window.partitionBy("source")
          .orderBy(col("es_key").desc, col("doc_id"))))
        .filter(col("rn") <= WeightedK)
        .select("source", "rn", "doc_id", "n_chars", "es_key")
        .orderBy("source", "rn")
    }),

    // Per-source language-mix drift: KL(source's lang distribution ||
    // corpus-wide lang distribution) — the domain-mix monitoring number
    // a pipeline alarms on when one source's composition shifts. Counts
    // are three broadcast-sized hash aggregates off ONE (source, lang)
    // frame; each KL term is c_sl * ln((c_sl*n)/(n_s*c_l)) with the ln
    // FLOAT-collapsed onto the micro-nat grid, so per-source sums are
    // exact BIGINT and both engines agree digit-for-digit.
    "q_source_kl" -> ((s, d) => {
      val sl = Tables.load(s, d, "documents")
        .groupBy("source", "lang").agg(count(lit(1)).as("c_sl"))
      val srcN = sl.groupBy("source").agg(sum("c_sl").as("n_s"))
      val langN = sl.groupBy("lang").agg(sum("c_sl").as("c_l"))
      val tot = sl.agg(sum("c_sl").as("n"))
      sl.join(broadcast(srcN), Seq("source"))
        .join(broadcast(langN), Seq("lang"))
        .crossJoin(broadcast(tot))
        .withColumn("t", expr(
          "CAST(ROUND(c_sl * CAST(CAST(ln((CAST(c_sl AS DOUBLE) * n)" +
            " / (CAST(n_s AS DOUBLE) * c_l)) AS FLOAT) AS DOUBLE)" +
            " * 1000000) AS BIGINT)"))
        .groupBy("source")
        .agg(max("n_s").as("n_docs"), sum("t").as("kl_unats"))
        .select(col("source"), col("n_docs"), col("kl_unats"),
          expr("CAST(kl_unats AS DOUBLE) / CAST(1000000 AS DOUBLE)").as("kl_nats"))
        .orderBy("source")
    }),

    // Curriculum phasing: split the corpus into three quality bands with
    // DATA-DERIVED boundaries and NO global sort — quality lands on a
    // fixed milli-grid, the cumulative runs over the ≤1001-row HISTOGRAM
    // (the q_quantile_hist trick), and the two threshold buckets come
    // back as one broadcast row. Per-phase doc/token totals are what a
    // training scheduler consumes.
    "q_curriculum" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = Tables.load(s, d, "documents")
        .selectExpr("doc_id", "size(split(text, ' ')) AS n_tokens",
          s"CAST(floor((${TextQueries.QualityExpr}) * 1000) AS BIGINT) AS qb")
      val hist = scored.groupBy("qb").agg(count(lit(1)).as("n"))
      val cum = hist
        .withColumn("cum", sum("n").over(Window.orderBy("qb")))
        .crossJoin(broadcast(hist.agg(sum("n").as("tot"))))
      val thresholds = cum.agg(
        min(when(col("cum") * 3 >= col("tot"), col("qb"))).as("t1"),
        min(when(col("cum") * 3 >= col("tot") * 2, col("qb"))).as("t2"))
      scored.crossJoin(broadcast(thresholds))
        .withColumn("phase", when(col("qb") <= col("t1"), lit(1L))
          .when(col("qb") <= col("t2"), lit(2L)).otherwise(lit(3L)))
        .groupBy("phase")
        .agg(count(lit(1)).as("n_docs"), min("qb").as("min_qb"),
          max("qb").as("max_qb"), sum("n_tokens").as("tokens"))
        .orderBy("phase")
    }),

    // Preference-pair construction (DPO/RLHF data prep): within each
    // (source, length-band) group, the top-quality doc becomes `chosen`
    // and the bottom-quality doc `rejected` — controlling for source and
    // length so the pair's contrast is quality. Both extremes come from
    // the SAME shuffle partitioning (two windows, one exchange);
    // single-doc groups self-pair and are dropped. Scale: group count is
    // bounded by sources x bands, per-group state is one row each way.
    "q_dpo_pairs" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = Tables.load(s, d, "documents")
        .selectExpr("doc_id", "source", s"n_chars DIV $DpoLenBucket AS len_bucket",
          s"(${TextQueries.QualityExpr}) AS q")
      val both = scored
        .withColumn("rn_top", row_number().over(Window
          .partitionBy("source", "len_bucket").orderBy(col("q").desc, col("doc_id"))))
        .withColumn("rn_bot", row_number().over(Window
          .partitionBy("source", "len_bucket").orderBy(col("q").asc, col("doc_id"))))
      val chosen = both.filter(col("rn_top") === 1)
        .select(col("source"), col("len_bucket"),
          col("doc_id").as("chosen_id"), col("q").as("chosen_q"))
      val rejected = both.filter(col("rn_bot") === 1)
        .select(col("source"), col("len_bucket"),
          col("doc_id").as("rejected_id"), col("q").as("rejected_q"))
      chosen.join(rejected, Seq("source", "len_bucket"))
        .filter(col("chosen_id") =!= col("rejected_id"))
        .select(col("source"), col("len_bucket"), col("chosen_id"),
          col("rejected_id"),
          (col("chosen_q") - col("rejected_q")).as("quality_gap"))
        .orderBy("source", "len_bucket")
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
    "q_bloom_decontam" -> {
      val duckPos = (0 until BloomK).map(j =>
        s"(h >> ${12 * j}) & ${BloomM - 1}").mkString("[", ", ", "]")
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |g0 AS (SELECT doc_id, UNNEST(${duckGrams(ContamN)}) AS g FROM d),
         |g AS (SELECT doc_id, ${duckH60("g")} AS h FROM g0),
         |bench AS (SELECT doc_id, h FROM g WHERE doc_id % $BenchMod = 0),
         |train AS (SELECT doc_id, h FROM g WHERE doc_id % $BenchMod <> 0),
         |bits AS (SELECT DISTINCT UNNEST($duckPos) AS p, 1 AS set_bit FROM bench),
         |probe AS (SELECT doc_id, h, UNNEST($duckPos) AS p FROM train),
         |m AS (SELECT doc_id, h, COUNT(set_bit) AS n_set, COUNT(*) AS n_tot
         |      FROM probe LEFT JOIN bits USING (p) GROUP BY doc_id, h),
         |blm AS (SELECT doc_id, COUNT(*) AS n_grams,
         |          COUNT(CASE WHEN n_set = n_tot THEN 1 END) AS n_bloom
         |        FROM m GROUP BY doc_id),
         |ex AS (SELECT t.doc_id, COUNT(DISTINCT t.h) AS n_exact
         |       FROM train t JOIN (SELECT DISTINCT h FROM bench) b ON t.h = b.h
         |       GROUP BY t.doc_id)
         |SELECT blm.doc_id AS doc_id, n_grams, n_bloom,
         |  COALESCE(n_exact, 0) AS n_exact, n_bloom > 0 AS flagged
         |FROM blm LEFT JOIN ex ON blm.doc_id = ex.doc_id
         |ORDER BY blm.doc_id""".stripMargin
    },
    "q_lm_bigram" ->
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |b AS (SELECT doc_id, UNNEST(list_transform(range(1, len(w)),
         |        i -> w[i] || ' ' || w[i + 1])) AS bigram FROM d),
         |c12 AS (SELECT bigram, COUNT(*) AS c12 FROM b GROUP BY bigram),
         |c1 AS (SELECT string_split(bigram, ' ')[1] AS w1, COUNT(*) AS c1
         |       FROM b GROUP BY 1),
         |v AS (SELECT COUNT(DISTINCT word) AS v FROM
         |        (SELECT UNNEST(string_split(lower(text), ' ')) AS word FROM documents)),
         |sc AS (SELECT bigram, ${graft.ops.Curation.bigramUnatsExpr("REAL")} AS unats
         |       FROM c12 JOIN c1 ON string_split(c12.bigram, ' ')[1] = c1.w1
         |       CROSS JOIN v),
         |per AS (SELECT doc_id, COUNT(*) AS n_bigrams,
         |          CAST(SUM(unats) AS BIGINT) AS total_unats
         |        FROM b JOIN sc USING (bigram) GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, total_unats,
         |  CAST(exp(CAST(total_unats AS DOUBLE) / n_bigrams / 1000000.0) AS REAL) AS ppl
         |FROM per ORDER BY doc_id""".stripMargin,
    "q_quality_classifier" -> clfOracleSql,
    "q_classifier_incremental" -> clfIncrementalOracleSql,
    "q_token_budget_select" ->
      s"""WITH s AS (SELECT doc_id, lang,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(FLOOR((${TextQueries.DuckQualityExpr}) * 1000) AS BIGINT) AS qp
         |FROM documents),
         |b AS (SELECT (CAST(SUM(n_tokens) AS BIGINT) * 6) // 10 AS budget FROM s),
         |o AS (SELECT s.*, COALESCE(SUM(n_tokens) OVER (
         |    ORDER BY (1000 - qp) * 1099511627776 + doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM s),
         |k AS (SELECT o.*, cb + n_tokens <= budget AS kept FROM o, b)
         |SELECT lang, COUNT(*) AS n_total,
         |  COUNT(CASE WHEN kept THEN 1 END) AS n_kept,
         |  CAST(SUM(CASE WHEN kept THEN n_tokens END) AS BIGINT) AS tokens_kept,
         |  MIN(CASE WHEN kept THEN doc_id END) AS first_kept
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    "q_split_leakage" ->
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |g0 AS (SELECT doc_id, UNNEST(${duckGrams(ContamN)}) AS g FROM d),
         |g AS (SELECT doc_id, ${duckH60("g")} AS h FROM g0),
         |tv AS (SELECT DISTINCT h FROM g WHERE doc_id % $LeakMod < $LeakTestFrom),
         |t AS (SELECT g.doc_id, g.h, tv.h IS NOT NULL AS hit
         |      FROM g LEFT JOIN tv ON g.h = tv.h
         |      WHERE g.doc_id % $LeakMod >= $LeakTestFrom)
         |SELECT doc_id, COUNT(*) AS n_grams,
         |  COUNT(CASE WHEN hit THEN 1 END) AS n_leaked,
         |  (COUNT(CASE WHEN hit THEN 1 END) * 1000) // COUNT(*) AS leak_permille,
         |  COUNT(CASE WHEN hit THEN 1 END) > 0 AS leaked
         |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,
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
    },
    "q_pii_redact" ->
      s"""WITH p AS (SELECT doc_id, ${piiText("VARCHAR")} AS s FROM documents),
         |r AS (SELECT doc_id, s, ${redactChain("s", "g")} AS red
         |      FROM p)
         |SELECT doc_id,
         |  ${piiCountSql("s", "len").zip(Seq("n_email", "n_phone", "n_ip"))
              .map { case (e, n) => s"$e AS $n," }.mkString("\n  ")}
         |  md5(red) AS redacted_fp,
         |  length(red) AS n_redacted_chars
         |FROM r ORDER BY doc_id""".stripMargin,
    "q_boilerplate" ->
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |b AS (SELECT doc_id, UNNEST(list_transform(range(1, len(w)),
         |        i -> w[i] || ' ' || w[i + 1])) AS bigram FROM d),
         |top AS (SELECT bigram, 1 AS is_boiler FROM (
         |          SELECT bigram, COUNT(*) AS df
         |          FROM (SELECT DISTINCT doc_id, bigram FROM b) GROUP BY bigram)
         |        ORDER BY df DESC, bigram LIMIT $BoilerK),
         |j AS (SELECT doc_id, COUNT(*) AS n_bigrams, COUNT(is_boiler) AS n_boiler
         |      FROM b LEFT JOIN top USING (bigram) GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, n_boiler,
         |  CAST(n_boiler AS DOUBLE) / n_bigrams AS boiler_frac,
         |  CAST(n_boiler AS DOUBLE) / n_bigrams > 0.5 AS flagged
         |FROM j ORDER BY doc_id""".stripMargin,
    "q_lm_unigram" ->
      s"""WITH w AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS word
         |           FROM documents),
         |tot AS (SELECT COUNT(*) AS nt FROM w),
         |vocab AS (SELECT word, ${graft.ops.Curation.unatsExpr("REAL")} AS unats
         |          FROM (SELECT word, COUNT(*) AS n FROM w GROUP BY word)
         |          CROSS JOIN tot),
         |s AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |        CAST(SUM(unats) AS BIGINT) AS total_unats
         |      FROM w JOIN vocab USING (word) GROUP BY doc_id)
         |SELECT doc_id, n_tokens, total_unats,
         |  CAST(exp(CAST(total_unats AS DOUBLE) / n_tokens / 1000000.0) AS REAL) AS ppl
         |FROM s ORDER BY doc_id""".stripMargin,
    "q_source_mix" ->
      s"""WITH cnt AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
         |tot AS (SELECT COUNT(*) AS nt FROM documents),
         |r AS (SELECT source, n,
         |        CAST(n AS DOUBLE) / nt AS share,
         |        $MixTargetExpr AS target
         |      FROM cnt CROSS JOIN tot),
         |r2 AS (SELECT *, target / share AS ratio FROM r),
         |mx AS (SELECT MAX(ratio) AS mx FROM r2)
         |SELECT source, n, share, target,
         |  ratio / mx AS keep_rate,
         |  CAST(floor(CAST(n AS DOUBLE) * (ratio / mx)) AS BIGINT) AS n_keep
         |FROM r2 CROSS JOIN mx ORDER BY source""".stripMargin,
    "q_shard_plan" ->
      s"""SELECT ${duckH60("CAST(doc_id AS VARCHAR)")} % 64 AS shard,
         |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_bytes,
         |  MIN(doc_id) AS first_id
         |FROM documents GROUP BY shard ORDER BY shard""".stripMargin,
    "q_train_shuffle" ->
      s"""WITH h AS (SELECT doc_id,
         |    ${duckH60(s"'$ShuffleSeed:' || CAST(doc_id AS VARCHAR)")} AS hk
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    ROW_NUMBER() OVER (ORDER BY hk, doc_id) - 1 AS pos FROM h)
         |SELECT pos // $ShuffleBlock AS block, COUNT(*) AS n,
         |  MIN(pos) AS pos_lo, MAX(pos) AS pos_hi,
         |  CAST(SUM((pos % 1000003) * (doc_id % 1000003)) AS BIGINT) AS checksum
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_domain_cap" ->
      s"""WITH r AS (SELECT source, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY ${duckH60("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  COUNT(CASE WHEN rk <= $DomainCap THEN 1 END) AS n_kept,
         |  MIN(CASE WHEN rk = 1 THEN doc_id END) AS cap_head
         |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q_pipeline_curate" ->
      s"""WITH r AS (SELECT source, doc_id, text,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY ${duckH60("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
         |  FROM documents),
         |capped AS (SELECT source, doc_id, text FROM r WHERE rk <= $DomainCap),
         |d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         |g0 AS (SELECT doc_id, UNNEST(${duckGrams(ContamN)}) AS g FROM d),
         |g AS (SELECT doc_id, ${duckH60("g")} AS h FROM g0),
         |bench AS (SELECT h FROM g WHERE doc_id % $BenchMod = 0),
         |contam AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (h)
         |           WHERE g.doc_id % $BenchMod <> 0),
         |clean AS (SELECT c.source, c.doc_id, c.text FROM capped c
         |  WHERE c.doc_id % $BenchMod <> 0
         |    AND c.doc_id NOT IN (SELECT doc_id FROM contam)),
         |st AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
         |cs AS (SELECT source, COUNT(*) AS n_capped FROM capped GROUP BY source),
         |cl AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_clean,
         |    CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens
         |  FROM clean GROUP BY source)
         |SELECT st.source, st.n_docs, cs.n_capped,
         |  CAST(COALESCE(cl.n_clean, 0) AS BIGINT) AS n_clean,
         |  CAST(COALESCE(cl.n_tokens, 0) AS BIGINT) AS n_tokens
         |FROM st JOIN cs USING (source) LEFT JOIN cl USING (source)
         |ORDER BY source""".stripMargin,
    "q_mix_temperature" ->
      s"""WITH st AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
         |sm AS (SELECT source, n_docs,
         |    CAST(ROUND(CAST(sqrt(CAST(n_docs AS DOUBLE)) AS REAL)
         |      * CAST(1000000 AS DOUBLE)) AS BIGINT) AS s_micro
         |  FROM st),
         |tot AS (SELECT CAST(SUM(s_micro) AS BIGINT) AS tot_micro,
         |    CAST(SUM(n_docs) AS BIGINT) AS tot_docs FROM sm),
         |rated AS (SELECT source, n_docs,
         |    (s_micro * 1000000) // tot_micro AS share_ppm,
         |    LEAST(1000000, (((s_micro * 1000000) // tot_micro)
         |      * (tot_docs // 2)) // n_docs) AS rate_ppm
         |  FROM sm CROSS JOIN tot),
         |kept AS (SELECT d.source, COUNT(*) AS n_sampled
         |  FROM documents d JOIN rated r ON d.source = r.source
         |  WHERE ${duckH60("CAST(doc_id AS VARCHAR)")} % 1000000 < r.rate_ppm
         |  GROUP BY d.source)
         |SELECT r.source, r.n_docs, r.share_ppm, r.rate_ppm,
         |  CAST(COALESCE(k.n_sampled, 0) AS BIGINT) AS n_sampled
         |FROM rated r LEFT JOIN kept k USING (source)
         |ORDER BY source""".stripMargin,

    "q_weighted_sample" ->
      s"""WITH k AS (
         |  SELECT doc_id, source, n_chars,
         |    CAST(CAST(ln(CAST(${duckH60("CAST(doc_id AS VARCHAR)")} AS DOUBLE)
         |      / 1152921504606846976.0) AS REAL) AS DOUBLE)
         |      / CAST(n_chars AS DOUBLE) AS es_key
         |  FROM documents),
         |r AS (SELECT source, doc_id, n_chars, es_key,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY es_key DESC, doc_id) AS rn
         |  FROM k)
         |SELECT source, rn, doc_id, n_chars, es_key
         |FROM r WHERE rn <= $WeightedK ORDER BY source, rn""".stripMargin,

    "q_source_kl" ->
      """WITH sl AS (SELECT source, lang, COUNT(*) AS c_sl
        |  FROM documents GROUP BY 1, 2),
        |sn AS (SELECT source, CAST(SUM(c_sl) AS BIGINT) AS n_s FROM sl GROUP BY 1),
        |lc AS (SELECT lang, CAST(SUM(c_sl) AS BIGINT) AS c_l FROM sl GROUP BY 1),
        |tt AS (SELECT CAST(SUM(c_sl) AS BIGINT) AS n FROM sl),
        |t AS (SELECT sl.source, sn.n_s,
        |    CAST(ROUND(c_sl * CAST(CAST(ln((CAST(c_sl AS DOUBLE) * n)
        |      / (CAST(n_s AS DOUBLE) * c_l)) AS REAL) AS DOUBLE)
        |      * 1000000) AS BIGINT) AS t
        |  FROM sl JOIN sn USING (source) JOIN lc USING (lang) CROSS JOIN tt)
        |SELECT source, MAX(n_s) AS n_docs,
        |  CAST(SUM(t) AS BIGINT) AS kl_unats,
        |  CAST(CAST(SUM(t) AS BIGINT) AS DOUBLE)
        |    / CAST(1000000 AS DOUBLE) AS kl_nats
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    "q_curriculum" ->
      s"""WITH s AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         |    CAST(floor((${TextQueries.DuckQualityExpr}) * 1000) AS BIGINT) AS qb
         |  FROM documents),
         |h AS (SELECT qb, COUNT(*) AS n FROM s GROUP BY qb),
         |c AS (SELECT qb, SUM(n) OVER (ORDER BY qb) AS cum FROM h),
         |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM h),
         |th AS (SELECT MIN(CASE WHEN cum * 3 >= tot THEN qb END) AS t1,
         |    MIN(CASE WHEN cum * 3 >= tot * 2 THEN qb END) AS t2
         |  FROM c CROSS JOIN tt)
         |SELECT CAST(CASE WHEN qb <= t1 THEN 1 WHEN qb <= t2 THEN 2
         |    ELSE 3 END AS BIGINT) AS phase,
         |  COUNT(*) AS n_docs, MIN(qb) AS min_qb, MAX(qb) AS max_qb,
         |  CAST(SUM(n_tokens) AS BIGINT) AS tokens
         |FROM s CROSS JOIN th GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dpo_pairs" ->
      s"""WITH s AS (SELECT doc_id, source, n_chars // $DpoLenBucket AS len_bucket,
         |    (${TextQueries.DuckQualityExpr}) AS q
         |  FROM documents),
         |r AS MATERIALIZED (SELECT doc_id, source, len_bucket, q,
         |    ROW_NUMBER() OVER (PARTITION BY source, len_bucket
         |      ORDER BY q DESC, doc_id) AS rn_top,
         |    ROW_NUMBER() OVER (PARTITION BY source, len_bucket
         |      ORDER BY q ASC, doc_id) AS rn_bot
         |  FROM s)
         |SELECT c.source, c.len_bucket, c.doc_id AS chosen_id,
         |  b.doc_id AS rejected_id, c.q - b.q AS quality_gap
         |FROM r c JOIN r b
         |  ON c.source = b.source AND c.len_bucket = b.len_bucket
         |WHERE c.rn_top = 1 AND b.rn_bot = 1 AND c.doc_id <> b.doc_id
         |ORDER BY c.source, c.len_bucket""".stripMargin
  )
}
