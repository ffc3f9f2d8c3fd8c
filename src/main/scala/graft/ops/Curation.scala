package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-parameterized curation operators, usable on ANY DataFrame —
  * the library surface behind the fixed benchmark queries in
  * [[graft.queries.CurationQueries]]. Every operator is a declarative
  * plan with the scale shape documented on the query side: map-only
  * scans where possible, broadcast-sized statistics joined back where
  * not, and no unbounded join keys anywhere.
  */
object Curation {

  /** PII patterns shared with the oracle replay: no backslash escapes
    * (`[.]` not `\.`) and `(?i)` for case-insensitivity, so the
    * identical literals run as Java regex and RE2 with the same
    * semantics (ASCII case folding is identical in both).
    *
    * DEMO-GRADE defaults: the phone pattern only covers the North
    * American 555 test prefix and the email pattern ignores quoted
    * local parts / IDN domains. Substitute your jurisdiction's
    * patterns at the call site before scrubbing real data.
    */
  val DefaultPatterns: Seq[(String, String)] = Seq(
    "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+" -> "<EMAIL>",
    "555-[0-9]{4}" -> "<PHONE>",
    "[0-9]{1,3}([.][0-9]{1,3}){3}" -> "<IP>")

  /** Redact every pattern in order (order matters: earlier replacements
    * can mask later patterns). One codegen projection, no shuffle.
    */
  def redactPii(c: Column,
      patterns: Seq[(String, String)] = DefaultPatterns): Column =
    patterns.foldLeft(c) { case (acc, (re, repl)) =>
      regexp_replace(acc, re, repl)
    }

  /** Per-pattern match counts on the raw text (for audit columns). */
  def piiCounts(c: Column,
      patterns: Seq[(String, String)] = DefaultPatterns): Seq[Column] =
    patterns.map { case (re, _) => size(regexp_extract_all(c, lit(re), lit(0))) }

  /** Flag the K most document-frequent bigrams of `textCol` as
    * boilerplate and report per-document occupancy. The flagged set is
    * EXACTLY K rows at any corpus size — the join-back broadcasts by
    * construction. Returns (idCol, n_bigrams, n_boiler, boiler_frac,
    * flagged).
    */
  def boilerplate(df: DataFrame, idCol: String, textCol: String,
      k: Int, flagAbove: Double = 0.5): DataFrame = {
    // explode_outer: documents with fewer than 2 words keep their row
    // (null bigram -> n_bigrams = 0) instead of vanishing from the
    // report.
    val b = df.select(col(idCol), split(lower(col(textCol)), " ").as("w"))
      .select(col(idCol), explode_outer(expr(
        """CASE WHEN size(w) < 2 THEN array()
          |     ELSE transform(sequence(1, size(w) - 1),
          |            i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))
          |END""".stripMargin)).as("bigram"))
    boilerplateFromBigrams(b, idCol, k, flagAbove)
  }

  /** [[boilerplate]] over a pre-built `(idCol, bigram)` frame — the entry
    * point for callers that already persist a shared bigram frame (the
    * benchmark queries). Null bigrams count as zero-bigram documents.
    */
  def boilerplateFromBigrams(b: DataFrame, idCol: String,
      k: Int, flagAbove: Double = 0.5): DataFrame = {
    val top = b.filter(col("bigram").isNotNull).select(idCol, "bigram").distinct()
      .groupBy("bigram").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("bigram"))
      .limit(k)
      .select(col("bigram"), lit(1).as("is_boiler"))
    b.join(broadcast(top), Seq("bigram"), "left")
      .groupBy(idCol)
      .agg(count(col("bigram")).as("n_bigrams"), count(col("is_boiler")).as("n_boiler"))
      .select(col(idCol), col("n_bigrams"), col("n_boiler"),
        coalesce(expr("CAST(n_boiler AS DOUBLE) / nullif(n_bigrams, 0)"), lit(0.0))
          .as("boiler_frac"))
      .withColumn("flagged", col("boiler_frac") > flagAbove)
  }

  /** [[boilerplateFromBigrams]] over a pre-aggregated `(idCol, bigram,
    * n)` occurrence-count frame (bigrams must be non-null, which any
    * explode-built count frame guarantees). Document frequency is one
    * row-count per bigram — each (doc, bigram) appears exactly once —
    * and the per-doc fractions are exact integer sums of n, so the
    * result matches the per-occurrence formulation bit-for-bit while
    * only ever shuffling the distinct-pair frame.
    */
  /** [[boilerplateFromCounts]] with the per-doc totals DECOUPLED from
    * the count frame (r15, verdict r14 item 1): `totals` is a
    * `(idCol, n_bigrams)` frame the caller derives map-only from the
    * raw documents (n_bigrams = len(words) − 1 for len ≥ 2 — exactly
    * the docs that have bigram rows, so the output row set is
    * unchanged). The flagged-mass aggregate then runs over ONLY the
    * count rows matching the K broadcast bigrams instead of
    * re-shuffling the whole count frame for a second doc-keyed
    * aggregate — the corpus-sized groupBy(doc) disappears; what
    * remains doc-keyed is bounded by docs-containing-a-top-K-bigram.
    *
    * MEASURED AND REJECTED as the q_boilerplate default at gate scale
    * (r15): the flagged-mass aggregate becomes a third sequential
    * broadcast-build job (top-K build → boiler-agg build → final
    * join), and at sf0.1 the extra job floor costs more than the
    * 950k-row aggregate it saves — isolated 0.505/0.559 s vs the
    * 2-job shape's 0.351-0.397 s band. It remains the right shape once
    * the count frame outgrows what a second full pass should touch
    * (the corpus-sized groupBy is the 100 TB cost, the job floor is
    * constant), which is why it is kept as a first-class API.
    */
  def boilerplateFoldedFromCounts(totals: DataFrame, bc: DataFrame,
      idCol: String, k: Int, flagAbove: Double = 0.5): DataFrame = {
    val top = bc
      .groupBy("bigram").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("bigram"))
      .limit(k)
      .select("bigram")
    val boiler = bc.join(broadcast(top), Seq("bigram"))
      .groupBy(idCol).agg(sum("n").as("nb"))
    totals.join(boiler, Seq(idCol), "left")
      .select(col(idCol), col("n_bigrams"),
        coalesce(col("nb"), lit(0L)).as("n_boiler"),
        coalesce(expr("CAST(coalesce(nb, 0) AS DOUBLE) / nullif(n_bigrams, 0)"),
          lit(0.0)).as("boiler_frac"))
      .withColumn("flagged", col("boiler_frac") > flagAbove)
  }

  def boilerplateFromCounts(bc: DataFrame, idCol: String,
      k: Int, flagAbove: Double = 0.5): DataFrame = {
    val top = bc
      .groupBy("bigram").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("bigram"))
      .limit(k)
      .select(col("bigram"), lit(1).as("is_boiler"))
    bc.join(broadcast(top), Seq("bigram"), "left")
      .groupBy(idCol)
      .agg(sum("n").as("n_bigrams"),
        sum(when(col("is_boiler").isNotNull, col("n")).otherwise(lit(0L))).as("n_boiler"))
      .select(col(idCol), col("n_bigrams"), col("n_boiler"),
        coalesce(expr("CAST(n_boiler AS DOUBLE) / nullif(n_bigrams, 0)"), lit(0.0))
          .as("boiler_frac"))
      .withColumn("flagged", col("boiler_frac") > flagAbove)
  }

  /** Corpus-trained unigram surprisal per document in integer
    * micro-nats (order-independent exact sums; the one `ln` is
    * FLOAT-collapsed before rounding so libm last-ulp differences
    * cannot change the integer). Returns (idCol, n_tokens,
    * total_unats, ppl).
    */
  def lmUnigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    lmUnigramFromWords(
      df.select(col(idCol), explode(split(lower(col(textCol)), " ")).as("word")),
      idCol)

  /** Micro-nat surprisal of one vocabulary probability, `n` out of `nt`
    * occurrences. Shared verbatim with the DuckDB oracle (floatT = REAL)
    * so the FLOAT-collapse subtlety lives in exactly one place.
    */
  def unatsExpr(floatT: String): String =
    s"CAST(ROUND(CAST(CAST(-ln(CAST(n AS DOUBLE) / nt) AS $floatT) AS DOUBLE) * 1000000) AS BIGINT)"

  /** [[lmUnigramScore]] over a pre-built `(idCol, word)` frame — the
    * entry point for callers with a shared persisted word frame.
    */
  def lmUnigramFromWords(w: DataFrame, idCol: String): DataFrame =
    lmUnigramFromCounts(
      w.groupBy(idCol, "word").agg(count(lit(1)).as("tf")), idCol)

  /** [[lmUnigramFromWords]] over a pre-aggregated `(idCol, word, tf)`
    * term-frequency frame — the entry point for callers that already
    * persist one (the dedup/tf-idf family does). All model statistics
    * fold out of the counts: occurrence totals are Σtf, so both the
    * vocabulary aggregate and the per-document surprisal run over the
    * (much smaller) distinct (doc, word) frame, and the per-occurrence
    * sum Σ unats becomes the exact BIGINT product sum Σ tf·unats.
    */
  def lmUnigramFromCounts(wc: DataFrame, idCol: String,
      scoredVocab: Option[DataFrame] = None): DataFrame = {
    val vocab = scoredVocab.getOrElse(lmUnigramVocab(wc))
    wc.join(broadcast(vocab), Seq("word"))
      .groupBy(idCol)
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("unats")).as("total_unats"))
      .select(col(idCol), col("n_tokens"), col("total_unats"),
        expr("CAST(exp(CAST(total_unats AS DOUBLE) / n_tokens / 1000000.0) AS FLOAT)")
          .as("ppl"))
  }

  /** The trained unigram LM `(word, unats)` — the scoring artifact
    * [[lmUnigramFromCounts]] broadcasts. Exposed separately so callers
    * can train ONCE per corpus (persist/memoize this frame) and score
    * any number of frames against it — the classifier-weights
    * discipline. The token total folds out of the vocab aggregate with
    * a whole-frame window instead of a second corpus-sized pass; the
    * single-partition window is over the VOCABULARY (language-sized,
    * the same bound that makes it broadcastable), never the corpus.
    */
  def lmUnigramVocab(wc: DataFrame): DataFrame =
    wc.groupBy("word").agg(sum("tf").as("n"))
      .withColumn("nt", sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      .select(col("word"), expr(unatsExpr("FLOAT")).as("unats"))

  /** Micro-nat surprisal of one ADD-ONE-SMOOTHED bigram probability
    * P(w2|w1) = (c12 + 1) / (c1 + v): c12 the bigram count, c1 the
    * prefix occurrence count, v the unigram vocabulary size. Shared
    * verbatim with the DuckDB oracle (floatT = REAL), same
    * FLOAT-collapse-then-integer-grid determinism as [[unatsExpr]].
    */
  def bigramUnatsExpr(floatT: String): String =
    s"CAST(ROUND(CAST(CAST(-ln(CAST(c12 + 1 AS DOUBLE) / (c1 + v)) AS $floatT) AS DOUBLE) * 1000000) AS BIGINT)"

  /** Corpus-trained add-one-smoothed bigram surprisal per document over
    * a pre-built `(idCol, bigram)` frame; `nVocab` is a one-row frame
    * with the unigram vocabulary size as column `v`. Prefix counts and
    * the vocabulary scalar broadcast (both are language-sized, not
    * corpus-sized); the scored bigram table joins back with a plain
    * equi-join — unlike the unigram vocab, the bigram vocabulary keeps
    * growing with corpus size, so it is NOT assumed broadcast-safe.
    * Returns (idCol, n_bigrams, total_unats, ppl).
    */
  def lmBigramFromBigrams(b: DataFrame, idCol: String,
      nVocab: DataFrame): DataFrame =
    lmBigramFromCounts(
      b.groupBy(idCol, "bigram").agg(count(lit(1)).as("n")), idCol, nVocab)

  /** [[lmBigramFromBigrams]] over a pre-aggregated `(idCol, bigram, n)`
    * occurrence-count frame — the entry point for callers that already
    * persist a shared count frame. All model statistics fold out of the
    * counts (c12 = Σn per bigram; prefix counts c1 = Σc12 per w1, a
    * vocab-sized aggregate instead of a second corpus-sized shuffle),
    * and the per-doc surprisal is the exact integer sum Σ n·unats, so
    * the result is bit-identical to the per-occurrence formulation.
    * The scored bigram table still joins back with a plain equi-join —
    * the bigram vocabulary keeps growing with corpus size, so it is
    * NOT assumed broadcast-safe.
    */
  def lmBigramFromCounts(bc: DataFrame, idCol: String,
      nVocab: DataFrame, vocabCounts: Option[DataFrame] = None,
      scoredTable: Option[DataFrame] = None): DataFrame = {
    // Callers that already persist the trained `(bigram, unats)` table
    // pass it in (train-once discipline); otherwise it derives here
    // from the `(bigram, c12)` vocabulary (itself passed in by callers
    // that share that aggregate).
    val scored = scoredTable.getOrElse(lmBigramScored(
      vocabCounts.getOrElse(bc.groupBy("bigram").agg(sum("n").as("c12"))),
      nVocab))
    bc.join(scored, Seq("bigram"))
      .groupBy(idCol)
      .agg(sum("n").as("n_bigrams"), sum(col("n") * col("unats")).as("total_unats"))
      .select(col(idCol), col("n_bigrams"), col("total_unats"),
        expr("CAST(exp(CAST(total_unats AS DOUBLE) / n_bigrams / 1000000.0) AS FLOAT)")
          .as("ppl"))
  }

  /** The trained bigram LM `(bigram, unats)` over a `(bigram, c12)`
    * vocabulary — [[lmBigramFromCounts]]'s scoring artifact, exposed so
    * callers can train once and persist it. Prefix counts and the
    * vocabulary scalar broadcast (both language-sized); the result
    * keeps growing with corpus size, so unlike the unigram table it is
    * NOT assumed broadcast-safe — callers join it back with a plain
    * equi-join.
    */
  def lmBigramScored(c12: DataFrame, nVocab: DataFrame): DataFrame = {
    val c1 = c12
      .select(expr("element_at(split(bigram, ' '), 1)").as("w1"), col("c12"))
      .groupBy("w1").agg(sum("c12").as("c1"))
    c12
      .withColumn("w1", expr("element_at(split(bigram, ' '), 1)"))
      .join(broadcast(c1), Seq("w1"))
      .crossJoin(broadcast(nVocab))
      .select(col("bigram"), expr(bigramUnatsExpr("FLOAT")).as("unats"))
  }

  /** Per-group keep rates reaching `targets` (groupValue -> target
    * fraction) with maximum retention: the most under-represented group
    * keeps 100%, everything else downsamples proportionally. Returns
    * (groupCol, n, share, target, keep_rate, n_keep).
    */
  def mixtureWeights(df: DataFrame, groupCol: String,
      targets: Map[String, Double], defaultTarget: Double): DataFrame = {
    val tgt = targets.foldLeft(
      when(lit(false), lit(0.0))) { case (acc, (v, t)) =>
      acc.when(col(groupCol) === v, lit(t))
    }.otherwise(lit(defaultTarget))
    val cnt = df.groupBy(groupCol).agg(count(lit(1)).as("n"))
    val tot = df.agg(count(lit(1)).as("nt"))
    val shared = cnt.crossJoin(broadcast(tot))
      .withColumn("target", tgt)
      .withColumn("share", expr("CAST(n AS DOUBLE) / nt"))
      .withColumn("ratio", expr("target / share"))
    val mx = shared.agg(max("ratio").as("mx"))
    shared.crossJoin(broadcast(mx))
      .select(col(groupCol), col("n"), col("share"), col("target"),
        expr("ratio / mx").as("keep_rate"),
        expr("CAST(floor(CAST(n AS DOUBLE) * (ratio / mx)) AS BIGINT)").as("n_keep"))
  }

  /** The portable 60-bit key hash (first 15 hex chars of md5, same value
    * as DuckDB `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`) — ONE
    * definition for every hash-derived operator here, because the whole
    * oracle-exactness story depends on this expression being identical
    * everywhere.
    */
  private def portableHash(idColName: String): Column =
    expr(s"CAST(conv(substr(md5(CAST($idColName AS STRING)), 1, 15), 16, 10) AS BIGINT)")

  /** Deterministic portable-hash shard assignment (same value on any
    * cluster, no rand()) over the named key column. Feed straight into
    * `.write.partitionBy(...)`.
    */
  def shardAssign(idColName: String, nShards: Int): Column =
    portableHash(idColName) % nShards

  /** Deterministic keep-predicate for hash sampling: true for rows whose
    * portable key hash lands below `rate` out of `outOf` buckets. `rate`
    * may be any Column (e.g. a per-stratum CASE), making this the
    * building block for both flat and stratified sampling — reproducible
    * on any cluster, no rand().
    */
  def hashKeep(idColName: String, rate: Column, outOf: Int): Column =
    (portableHash(idColName) % outOf) < rate

  /** Sliding-window training chunks: split `textCol` into windows of
    * `maxTokens` with `overlap` tokens shared between neighbors. Chunk
    * count and bounds are closed-form per document, so the whole
    * operator is one narrow explode with NO shuffle; provenance columns
    * (chunk_id, start_tok, n_tok, fp) keep chunks re-joinable to their
    * source rows. Returns (idCol, chunk_id, start_tok, n_tok, fp).
    */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      "overlap must be in [0, maxTokens) — a negative overlap would " +
        "silently skip tokens between chunks")
    val stride = maxTokens - overlap
    df.select(col(idCol), split(lower(col(textCol)), " ").as("w"))
      .withColumn("n", size(col("w")))
      .withColumn("nc", expr(
        s"CASE WHEN n <= $maxTokens THEN 1 ELSE 1 + CAST(ceil(CAST(n - $maxTokens AS DOUBLE) / $stride) AS INT) END"))
      .select(col(idCol), col("w"), col("n"),
        explode(expr("sequence(0, nc - 1)")).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        expr(s"chunk_id * $stride + 1").as("start_tok"),
        expr(s"least($maxTokens, n - chunk_id * $stride)").as("n_tok"),
        expr(s"md5(concat_ws(' ', slice(w, chunk_id * $stride + 1, " +
          s"least($maxTokens, n - chunk_id * $stride))))").as("fp"))
  }

  /** Benchmark decontamination over pre-hashed n-gram frames
    * `(idCol, h)`: flag every training row sharing at least one gram
    * hash with the benchmark side. The benchmark side is broadcast (an
    * eval set is small by definition), so the training corpus is
    * scanned once with a map-side join and never shuffled. Returns
    * (idCol, n_shared, min_bench_id).
    */
  def decontaminateFromGrams(trainGrams: DataFrame, benchGrams: DataFrame,
      idCol: String, benchIdCol: String): DataFrame =
    trainGrams
      .join(broadcast(benchGrams.select(col(benchIdCol), col("h"))), Seq("h"))
      .groupBy(idCol)
      .agg(countDistinct("h").as("n_shared"),
        min(benchIdCol).as(s"min_$benchIdCol"))

  /** Bloom-filter decontamination over pre-hashed gram frames
    * `(idCol, h)`: the scale path of [[decontaminateFromGrams]]. The
    * benchmark side is reduced to its set-bit positions — at most
    * `bloomM` rows regardless of corpus size — and broadcast to the
    * training scan; the exact membership join rides along so the output
    * exposes the filter's one-sided error contract (n_bloom >= n_exact
    * always; collisions visible wherever n_bloom > n_exact).
    *
    * A gram is bloom-positive iff EVERY probe row of its (id, h) group
    * found a set bit: the test is `n_set = n_tot` (matched = total),
    * NOT `n_set = bloomK`, so a gram hash occurring t > 1 times in a
    * document (t*k probe rows) still reads positive when all k of its
    * positions are set — comparing against the constant k would
    * silently turn repeats into false negatives and break the
    * one-sided contract. Duplicate positions among one gram's k probes
    * (p_i = p_j) are also safe: each probe row still joins its own hit.
    */
  def bloomDecontamFromGrams(trainGrams: DataFrame, benchGrams: DataFrame,
      idCol: String, bloomM: Int, bloomK: Int): DataFrame = {
    require(Integer.bitCount(bloomM) == 1, "bloomM must be a power of two")
    val posCols = (0 until bloomK).map(j =>
      expr(s"shiftright(h, ${12 * j}) & ${bloomM - 1}"))
    val bits = benchGrams.select(explode(array(posCols: _*)).as("p")).distinct()
      .withColumn("set_bit", lit(1))
    val bloom = trainGrams
      .select(col(idCol), col("h"), explode(array(posCols: _*)).as("p"))
      .join(broadcast(bits), Seq("p"), "left")
      .groupBy(idCol, "h")
      .agg(count("set_bit").as("n_set"), count(lit(1)).as("n_tot"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("n_set") === col("n_tot"), 1)).as("n_bloom"))
    val exact = trainGrams
      .join(broadcast(benchGrams.select("h").distinct()), Seq("h"))
      .groupBy(idCol).agg(countDistinct("h").as("n_exact"))
    bloom.join(exact, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"), col("n_bloom"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        (col("n_bloom") > 0).as("flagged"))
  }
}
