package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables

/** Deduplication operators over the `documents` table — the
  * training-data-pipeline family the 100 TB brief adds on top of the
  * reference surface. Every variant is bucketed/banded (shingle blocks,
  * simhash bands, minhash-LSH bands): Spark never does an all-pairs
  * cross join; the DuckDB oracles replay the identical deterministic
  * pipelines (portable md5-derived hashes, integer arithmetic, one final
  * double division), so even the LSH candidate generation is
  * hash-checked exactly.
  *
  * Scale notes: shingle-based candidate generation applies a hot-shingle
  * document-frequency cutoff (`df < maxDocFreq`) BEFORE the self-join — a
  * stop-shingle shared by 10^5 docs would otherwise materialize 10^10
  * pairs on one key, the classic skewed-key blowup. Verification still
  * counts ALL common shingles (the cutoff prunes candidate generation
  * only, never the Jaccard numerator), so a surviving pair's score is
  * exact. Band signatures shard evenly by construction. Jaccard
  * verification touches candidate pairs only. r15: candidate generation,
  * df statistics, and scoring all run over DISTINCT TEXTS (one rep per
  * byte-identical group) with member pairs expanded algebraically, so a
  * mirror-farm cluster of any size contributes df = 1 per shingle and
  * the jaccard family finds it in full (it was invisible under the r14
  * doc-level cutoff once the cluster outgrew the cutoff).
  */
object DedupQueries {

  /** Portable 60-bit word/shingle hash: first (most-significant) 15 hex chars of md5.
    * Spark: conv(hex,16,10); DuckDB: CAST('0x'||hex AS BIGINT).
    */
  private def h60(colName: String): String =
    s"CAST(conv(substr(md5($colName), 1, 15), 16, 10) AS BIGINT)"

  /** Segment width (words) for q_seg_dedup's within-doc repetition
    * removal; shared with the oracle. DEMO-GRADE: the synthetic docs are
    * one-line word streams, so "line" is approximated by a fixed window;
    * on real corpora the segmenter is `split(text, '\n')` and everything
    * downstream is unchanged. 2 words is the width at which the
    * synthetic vocabulary actually produces repeats (~2% of segments).
    */
  private[queries] val SegW = 2

  /** Distinct word 3-gram shingles over a pre-split words column `w` —
    * splitting once per row matters: inlining split() inside the lambda
    * would re-tokenize the document per shingle (quadratic per doc).
    */
  private val shinglesExpr: String =
    """array_distinct(
      |  CASE WHEN size(w) < 3 THEN array()
      |       ELSE transform(sequence(1, size(w) - 2),
      |              i -> concat_ws(' ', element_at(w, i),
      |                             element_at(w, i + 1), element_at(w, i + 2)))
      |  END)""".stripMargin

  // Shingle/word frames are reused several times inside each dedup plan
  // (candidate sides + verification sides + per-doc counts) and across the
  // ngram/minhash/simhash queries — persist one copy per sf dir instead of
  // re-exploding per plan reference.
  private val shCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame])
  private val wordCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame])
  private val simhashCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame])
  private val minhashCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame])
  private val jacCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String, Long, Boolean), DataFrame])
  private val jacCntCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String, Long, Boolean), Long])
  private val substrGramCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame])

  private[queries] def shingleDF(s: SparkSession, d: String): DataFrame =
    Tables.memo(shCache, (Tables.sessionKey(s), d))({
      Tables.load(s, d, "documents")
        .withColumn("w", split(lower(col("text")), " "))
        .select(col("doc_id"), explode(expr(shinglesExpr)).as("shingle"))
        // join/shuffle on a 60-bit hash instead of the shingle string:
        // fixed-width keys shrink the exchange payload; collisions are
        // negligible at 2^-60 and the oracle applies the identical hash.
        .select(col("doc_id"), expr(h60("shingle")).as("sh"))
        .persist()
    })

  private[queries] def wordDF(s: SparkSession, d: String): DataFrame =
    Tables.memo(wordCache, (Tables.sessionKey(s), d))({
      Tables.load(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
        .withColumn("h", expr(h60("word")))
        .persist()
    })

  private def shingleCounts(sh: DataFrame): DataFrame =
    sh.groupBy("doc_id").agg(count(lit(1)).as("n"))

  // Hot-shingle cutoff: default = max(1024, 8·⌊√N⌋) over the corpus doc
  // count N. The r13 default (cutoff = N) only excluded shingles present
  // in EVERY document — the r14 adversarial-skew probe planted a fixed
  // boilerplate preamble in 50% of documents and each of its shingles
  // (df = N/2, cold under the old rule) fanned out df²/2 candidate pairs
  // on a single join key: 276 s at skew-x10, unbounded beyond. With
  // cutoff c, per-key fan-out is < c²/2 and TOTAL candidate work is
  // bounded by c × |postings| (Σ df² ≤ c·Σ df over cold shingles), so
  // 8√N keeps the worst case O(N^1.5) and real corpora far under it.
  //
  // r15: the cutoff applies at the REP level — document frequency is
  // counted over DISTINCT TEXTS (one rep per byte-identical group,
  // docGroupsDF), and same-text pairs are always candidates via the
  // algebraic within-group expansion in jaccardPairsCached. The r14
  // doc-level rule had a completeness hole the r15 advice named: an
  // exact-duplicate cluster larger than the cutoff (mirror farms,
  // license pages — precisely what dedup most needs to find) made its
  // OWN shingles hot, so the cluster produced zero candidates. Rep-df
  // ≤ doc-df, so the rep-level rule is strictly more complete, and
  // collapsed clusters contribute df = 1 regardless of their size.
  // Remaining trade, documented (COVERAGE.md): a pair of DISTINCT texts
  // whose every shared shingle clears one-in-√N-scale DISTINCT-TEXT
  // frequency (pure boilerplate overlap across non-identical docs)
  // still never becomes a candidate; hot overlaps of surviving pairs
  // are still COUNTED exactly via the correction join, so scores never
  // change. Gate corpora are unaffected: max natural df at sf0.1 is
  // 25 vs the 1024 floor, measured r14. Derived from the data so the
  // same code is correct at any SF, replayed exactly in duckCandCte
  // (including the SPARK_GRAFT_MAX_SHINGLE_DF override, which duckCutoff
  // inlines as a literal so oracle parity survives tighter policies).
  private val docCountCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), Long])
  private def maxShingleDocFreq(s: SparkSession, d: String): Long =
    sys.env.get("SPARK_GRAFT_MAX_SHINGLE_DF").map(_.toLong).getOrElse {
      val n = docCountCache.getOrElseUpdate((Tables.sessionKey(s), d),
        Tables.load(s, d, "documents").count())
      math.max(1024L, 8L * math.floor(math.sqrt(n.toDouble)).toLong)
    }

  /** Candidate near-dup pairs from the shingle posting lists, with the
    * hot-shingle guard: shingles whose document frequency reaches
    * `maxDocFreq` are excluded from pair generation (they would emit
    * df^2/2 pairs on a single join key). Complete for every pair sharing
    * at least one sub-threshold shingle; callers verify with exact
    * Jaccard over the UNFILTERED shingle sets.
    */
  def ngramCandidates(sh: DataFrame, maxDocFreq: Long): DataFrame = {
    // df >= 2: a shingle seen in a single document generates no pairs, so
    // dropping it provably preserves the candidate set — and since the
    // overwhelming majority of shingles are unique, it collapses the
    // semi-join's build side from "all distinct shingles" to just the
    // shared ones (small enough to broadcast at any scale where near-dup
    // rates are sane).
    val cold = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") < maxDocFreq)
      .select("sh")
    val pruned = sh.join(cold, Seq("sh"), "left_semi")
    pruned.select(col("doc_id").as("ia"), col("sh"))
      .join(pruned.select(col("doc_id").as("ib"), col("sh")), Seq("sh"))
      .filter(col("ia") < col("ib"))
      .select("ia", "ib")
      .distinct()
  }

  /** Near-dup pairs with exact Jaccard, skew-guarded in ONE pass over the
    * shingle posting lists. Common-shingle counts for candidate pairs fall
    * directly out of the pruned self-join (`groupBy(ia, ib)` on the join
    * output) — no candidate materialization, no re-expansion of pairs
    * against full posting lists. Hot shingles (df >= maxDocFreq) are
    * excluded from pair GENERATION (the skew guard: a df-10^5 stop-shingle
    * would emit 10^10 pairs on one key) but still counted in each
    * surviving pair's Jaccard numerator via a per-candidate correction
    * join, which is bounded by |candidates| x (hot shingles per doc) —
    * and the distinct-hot set is tiny by construction. So scores are
    * exact over the FULL shingle sets while no join key ever fans out
    * past maxDocFreq. When no shingle reaches the cutoff the hot side is
    * an empty frame and the correction costs one cached-scan filter.
    */
  def jaccardPairs(sh: DataFrame, maxDocFreq: Long): DataFrame =
    jaccardPairs(sh, maxDocFreq, bigCorpus = false)

  def jaccardPairs(sh: DataFrame, maxDocFreq: Long, bigCorpus: Boolean): DataFrame =
    jaccardPairs(sh, maxDocFreq, bigCorpus, retainRarest = false)

  def jaccardPairs(
      sh: DataFrame, maxDocFreq: Long, bigCorpus: Boolean,
      retainRarest: Boolean): DataFrame = {
    // SHUFFLE_HASH, not sort-merge, once the shared-shingle key set has
    // outgrown any broadcast (r13 scale probe: the stats-flipped SMJ
    // plan re-SORTS the ~75M-row shingle frame on every join at 100×,
    // 265 s — none of these equi-joins needs an ordering). The hint is
    // gated on corpus size because a shuffle_hash hint BEATS
    // auto-broadcast in Spark's join selection: small corpora keep
    // their cheaper broadcast plans, exactly as benched.
    def h(df: DataFrame): DataFrame = if (bigCorpus) df.hint("shuffle_hash") else df
    val dfc = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    // df >= 2: single-document shingles can't pair; dropping them shrinks
    // the semi-join build side to just the shared shingles.
    val coldKeys = dfc.filter(col("df") >= 2 && col("df") < maxDocFreq).select("sh")
    val hotKeys = dfc.filter(col("df") >= maxDocFreq).select("sh")
    val shCold = sh.join(h(coldKeys), Seq("sh"), "left_semi")
    val shHot = sh.join(h(hotKeys), Seq("sh"), "left_semi")
    val commonCold = shCold.select(col("doc_id").as("ia"), col("sh"))
      .join(h(shCold.select(col("doc_id").as("ib"), col("sh"))), Seq("sh"))
      .filter(col("ia") < col("ib"))
      .groupBy("ia", "ib")
      .agg(count(lit(1)).as("common_cold"))
    val commonHot = commonCold.select("ia", "ib")
      .join(shHot.select(col("doc_id").as("ia"), col("sh")), Seq("ia"))
      .join(shHot.select(col("doc_id").as("ib"), col("sh")), Seq("ib", "sh"))
      .groupBy("ia", "ib")
      .agg(count(lit(1)).as("common_hot"))
    val cnt = shingleCounts(sh)
    val scored = commonCold
      .join(commonHot, Seq("ia", "ib"), "left")
      .withColumn("common", col("common_cold") + coalesce(col("common_hot"), lit(0L)))
      .join(cnt.select(col("doc_id").as("ia"), col("n").as("na")), Seq("ia"))
      .join(cnt.select(col("doc_id").as("ib"), col("n").as("nb")), Seq("ib"))
      // common/na/nb ride along so asymmetric measures (containment)
      // derive from the same shared frame without a rescan.
      .select(col("ia"), col("ib"), col("common"), col("na"), col("nb"),
        (col("common").cast(DoubleType) / (col("na") + col("nb") - col("common"))).as("jac"))
    if (!retainRarest) scored
    else {
      // RAREST-SHINGLE RETENTION (r16, verdict r15 item 6 — the measured
      // option against the documented completeness trade): a pair of
      // DISTINCT texts whose EVERY shared shingle clears the cutoff
      // (near-identical pure-boilerplate pages) never shares a cold
      // candidate key. Each doc therefore retains its globally rarest
      // PAIRABLE shingle (min df ≥ 2, tie-break min sh — a cold rarest
      // is already a candidate key, so retention only bites when it is
      // hot) as ONE unconditional candidate key. Near-identical shingle
      // sets pick the same global minimum whenever it lies in their
      // intersection, so the target class pairs up; it is a RECALL
      // HEURISTIC, not completeness — a pair whose rarest shingles fall
      // in their symmetric difference still never meets (documented in
      // COVERAGE.md). Extra pairs share NO cold shingle (those pairs are
      // in commonCold already — the anti-join enforces it), so their
      // common count is exactly the hot-overlap correction join. Cost:
      // one doc-keyed min-aggregate over the df-joined shingle frame +
      // a ≤1-key-per-doc self-join; a hot shingle retained by m docs
      // fans out m²/2 pairs, but any such m docs share their ENTIRE
      // rarest-rank prefix — overwhelmingly genuine near-dups whose
      // output the caller asked for (skew-wave numbers in SCALE.md).
      val rarest = sh.join(h(dfc.filter(col("df") >= 2)), Seq("sh"))
        .groupBy("doc_id")
        .agg(min(struct(col("df"), col("sh"))).as("r"))
        .filter(col("r.df") >= maxDocFreq)
        .select(col("doc_id"), col("r.sh").as("sh"))
      val extra = rarest.select(col("doc_id").as("ia"), col("sh"))
        .join(h(rarest.select(col("doc_id").as("ib"), col("sh"))), Seq("sh"))
        .filter(col("ia") < col("ib"))
        .select("ia", "ib")
        .join(commonCold.select("ia", "ib"), Seq("ia", "ib"), "left_anti")
      val extraScored = extra
        .join(shHot.select(col("doc_id").as("ia"), col("sh")), Seq("ia"))
        .join(h(shHot.select(col("doc_id").as("ib"), col("sh"))), Seq("ib", "sh"))
        .groupBy("ia", "ib")
        .agg(count(lit(1)).as("common"))
        .join(cnt.select(col("doc_id").as("ia"), col("n").as("na")), Seq("ia"))
        .join(cnt.select(col("doc_id").as("ib"), col("n").as("nb")), Seq("ib"))
        .select(col("ia"), col("ib"), col("common"), col("na"), col("nb"),
          (col("common").cast(DoubleType) / (col("na") + col("nb") - col("common"))).as("jac"))
      scored.unionByName(extraScored)
    }
  }

  /** (doc_id, rep) membership for the exact-duplicate collapse: rep =
    * min doc_id among byte-identical (lowercased-text) documents. One
    * md5 scan + one fingerprint aggregate; identical texts have
    * identical shingle sets AND identical per-doc shingle counts, so
    * every shingle statistic of a member is its rep's.
    */
  private val docGroupsCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame])
  private val repShCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame])

  /** Shared big-corpus gate: past ~100k documents the doc-keyed frames
    * outgrow any broadcast and stats-planned joins flip to SMJ, whose
    * sorts carry no information for these equi-joins — the gated
    * SHUFFLE_HASH hint (see jaccardPairs) applies to every
    * collapse-expansion join as well.
    */
  private[queries] def bigCorpus(s: SparkSession, d: String): Boolean =
    docCountCache.getOrElseUpdate((Tables.sessionKey(s), d),
      Tables.load(s, d, "documents").count()) > 100000L

  private[queries] def hb(df: DataFrame, big: Boolean): DataFrame =
    if (big) df.hint("shuffle_hash") else df

  private[queries] def docGroupsDF(s: SparkSession, d: String): DataFrame =
    Tables.memo(docGroupsCache, (Tables.sessionKey(s), d))({
      val fps = Tables.load(s, d, "documents")
        .select(col("doc_id"), md5(lower(col("text"))).as("fp"))
      fps.join(fps.groupBy("fp").agg(min("doc_id").as("rep")), Seq("fp"))
        .select("doc_id", "rep")
        .persist()
    })

  /** The shingle frame restricted to group reps (one row stream per
    * DISTINCT text). Candidate generation, df statistics, and common
    * counting all run over this frame, so an m-sized exact-duplicate
    * cluster contributes df = 1 — never m — to any shingle, and the
    * pair self-join cost is distinct-text-sized.
    */
  private[queries] def repShingleDF(s: SparkSession, d: String): DataFrame =
    Tables.memo(repShCache, (Tables.sessionKey(s), d))({
      // the reps side is doc-id-sized; past the big-corpus gate the
      // stats-planned join flips to SMJ and re-SORTS the corpus-sized
      // shingle frame (the r13 finding-8 pathology — none of these
      // equi-joins needs an ordering), so the hint mirrors
      // jaccardPairs's size-gated SHUFFLE_HASH discipline: small
      // corpora keep their cheaper auto-broadcast
      val reps = docGroupsDF(s, d).filter(col("doc_id") === col("rep"))
        .select("doc_id")
      shingleDF(s, d)
        .join(hb(reps, bigCorpus(s, d)), Seq("doc_id"), "left_semi")
        .persist()
    })

  // The scored pair frame is shared verbatim by q_dedup_ngram and
  // q_dedup_clusters (clusters = connected components OVER the ngram pair
  // graph), and the clustering iterates over it — persist one copy per
  // (session, dir, cutoff) like the shingle frames above.
  //
  // r15 exact-duplicate collapse: scores are computed ONCE per pair of
  // DISTINCT texts (rep level), then expanded algebraically — every
  // (member of A) × (member of B) combo inherits the rep pair's exact
  // common/na/nb/jac (identical texts ⇒ identical shingle sets), and
  // every within-group combo is a jac = 1.0 pair with common = na = nb
  // = the rep's distinct-shingle count. Expansion cost equals output
  // size; groups whose rep has ZERO shingles (< 3 words) drop out of
  // the within expansion via the inner repCnt join, exactly as the
  // verification inner join drops them in the oracle.
  private def jaccardPairsCached(s: SparkSession, d: String): DataFrame = {
    val cutoff = maxShingleDocFreq(s, d)
    // shared-shingle keys ∝ corpus size; past ~100k documents they are
    // beyond any broadcast and the hash-join path wins (see jaccardPairs)
    val big = bigCorpus(s, d)
    // SPARK_GRAFT_RETAIN_RAREST=1 turns on the rarest-shingle retention
    // (jaccardPairs scaladoc). The oracle replays the retention rule
    // under the same flag (r17, verdict r16 item 4 — duckRcand), so the
    // differential gate is green in BOTH modes: the default pass checks
    // the cutoff rule, a flagged pass checks cutoff + retention
    // (CORRECTNESS_RETAIN.json); exactness of the retention path is
    // additionally pinned against cutoff-free brute force in
    // CollapseEquivalenceSpec.
    val retain = sys.env.get("SPARK_GRAFT_RETAIN_RAREST").contains("1")
    Tables.memo(jacCache, (Tables.sessionKey(s), d, cutoff, retain))({
      val memb = docGroupsDF(s, d)
      val shRep = repShingleDF(s, d)
      val repScores = jaccardPairs(shRep, cutoff, big, retain)
      // cross-group expansion: member ids interleave across groups, so
      // order each combo explicitly — and since na/nb are PER-SIDE
      // (asymmetric containment reads them), they swap with the ids
      val cross = repScores
        .join(hb(memb.select(col("rep").as("ia"), col("doc_id").as("a")), big), Seq("ia"))
        .join(hb(memb.select(col("rep").as("ib"), col("doc_id").as("b")), big), Seq("ib"))
        .select(least(col("a"), col("b")).as("ia"),
          greatest(col("a"), col("b")).as("ib"),
          col("common"),
          when(col("a") < col("b"), col("na")).otherwise(col("nb")).as("na"),
          when(col("a") < col("b"), col("nb")).otherwise(col("na")).as("nb"),
          col("jac"))
      val repCnt = shingleCounts(shRep)
      val within = memb.select(col("rep"), col("doc_id").as("a"))
        .join(hb(memb.select(col("rep"), col("doc_id").as("b")), big), Seq("rep"))
        .filter(col("a") < col("b"))
        .join(hb(repCnt.select(col("doc_id").as("rep"), col("n")), big), Seq("rep"))
        .select(col("a").as("ia"), col("b").as("ib"),
          col("n").as("common"), col("n").as("na"), col("n").as("nb"),
          lit(1.0).as("jac"))
      cross.unionByName(within).persist()
    })
  }

  /** Row count of the shared Jaccard pair frame — the quantity
    * q_tfidf_sim's broadcast decision actually depends on (ADVICE r17:
    * the near-dup pair set is O(dups²) INDEPENDENT of doc count, so a
    * dup-heavy corpus under the 100k-doc gate can still blow past the
    * broadcast limit where a stats-planned join would have degraded
    * gracefully). One cached-scan aggregate over the already-persisted
    * frame, memoized under the frame's own key.
    */
  private def jaccardPairCount(s: SparkSession, d: String): Long = {
    val cutoff = maxShingleDocFreq(s, d)
    val retain = sys.env.get("SPARK_GRAFT_RETAIN_RAREST").contains("1")
    jacCntCache.getOrElseUpdate((Tables.sessionKey(s), d, cutoff, retain),
      jaccardPairsCached(s, d).count())
  }

  /** Exact Jaccard for the given candidate (ia, ib) pairs: count common
    * shingles by joining the shingle lists restricted to candidates.
    * Used where candidates come from a structure other than the shingle
    * lists themselves (e.g. MinHash bands).
    */
  private def verifyJaccard(sh: DataFrame, cand: DataFrame): DataFrame = {
    val cnt = shingleCounts(sh)
    val common = sh.select(col("doc_id").as("ia"), col("sh"))
      .join(cand, Seq("ia"))
      .join(sh.select(col("doc_id").as("ib"), col("sh")), Seq("ib", "sh"))
      .groupBy("ia", "ib")
      .agg(count(lit(1)).as("common"))
    common
      .join(cnt.select(col("doc_id").as("ia"), col("n").as("na")), Seq("ia"))
      .join(cnt.select(col("doc_id").as("ib"), col("n").as("nb")), Seq("ib"))
      .select(col("ia"), col("ib"),
        (col("common").cast(DoubleType) / (col("na") + col("nb") - col("common"))).as("jac"))
  }

  // MinHash permutation constants — inlined identically into the oracle.
  private val Prime = 2147483647L
  private val NumPerms = 16
  private def permA(i: Int): Long = (1103515245L * (i + 1)) % Prime
  private def permB(i: Int): Long = (12345L * (i + 1) + 7) % Prime

  private val SimBits = 60
  private val SimBandBits = 15 // 4 bands of 15 bits: hamming<=3 => >=1 band equal

  /** Persisted (doc_id, simhash) signature frame over GROUP REPS only
    * (r15 exact-text collapse: identical texts have identical word
    * multisets, hence identical signatures — computing one per distinct
    * text and expanding members algebraically is output-invisible, and
    * an m-sized mirror cluster stops costing m signature aggregations
    * plus m²-fan-out band buckets). It sits on both sides of the band
    * joins and under the 4-way band expansion; persisting it (one small
    * row per distinct text) runs the 60-aggregate computation once.
    * Every document has a signature (even an empty text hashes its one
    * empty token), so every group appears here.
    */
  private[queries] def simhashDF(s: SparkSession, d: String): DataFrame =
    Tables.memo(simhashCache, (Tables.sessionKey(s), d))({
      val sums = (0 until SimBits).map(i =>
        sum(when(expr(s"(h >> $i) & 1") === 1, 1).otherwise(-1)).as(s"s$i"))
      wordDF(s, d)
        .join(docGroupsDF(s, d).filter(col("doc_id") === col("rep"))
          .select("doc_id"), Seq("doc_id"), "left_semi")
        .groupBy("doc_id")
        .agg(sums.head, sums.tail: _*)
        .withColumn("simhash", expr(
          (0 until SimBits).map(i => s"CASE WHEN s$i > 0 THEN ${1L << i}L ELSE 0L END")
            .mkString(" + ")))
        .select("doc_id", "simhash")
        .persist()
    })

  /** Band expansion via explode (one scan, not a 4-branch union):
    * (doc_id, simhash, band, bsig) with 4 x 15-bit bands — pigeonhole-
    * complete for hamming <= 3.
    */
  private def simhashBands(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(lit): _*)).as("band"))
      .withColumn("bsig",
        expr(s"(simhash >> (band * $SimBandBits)) & ${(1 << SimBandBits) - 1}"))

  /** Every IncrMod-th doc id plays the "newly ingested batch" for the
    * incremental dedup operator; the rest is the already-indexed corpus.
    */
  private[queries] val IncrMod = 5

  /** Persisted `(doc_id, word, wt)` tf-idf weight frame — scanned three
    * times by the cosine re-scorer (norms + both dot sides), one copy
    * per (session, sf dir) like the other shared frames. `wt` is
    * tf x idf on the kilo-nat integer grid, so every downstream sum is
    * exact BIGINT.
    */
  private val tfidfCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame])

  /** Persisted `(doc_id, word, tf)` occurrence-count frame — the one
    * corpus-sized word shuffle per (session, sf dir); tf-idf weights,
    * document frequency, and the per-doc repetition maxima all derive
    * from this distinct-pair frame instead of re-aggregating the raw
    * per-occurrence word frame.
    */
  private val docWordCountCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame])

  private[queries] def docWordCounts(s: SparkSession, d: String): DataFrame =
    Tables.memo(docWordCountCache, (Tables.sessionKey(s), d))({
      wordDF(s, d).select("doc_id", "word")
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        .persist()
    })

  /** tf-idf weights scoped to the documents appearing in a near-dup
    * pair. IDF statistics are GLOBAL (df per word and the doc count
    * come from the full corpus — exactness requires it), but the
    * weight rows are joined and persisted only for pair documents:
    * r14 scale probe — the former corpus-wide weight frame joined idf
    * onto 100M (doc, word) rows and persisted them, of which
    * q_tfidf_sim (its only consumer) read the ~1% belonging to
    * near-dup pair documents. The idf side carries no broadcast hint:
    * with the tf side semi-filtered small, stats pick the right build
    * side at any scale (the old code force-broadcast a
    * corpus-vocabulary idf table, ~10M words at 100×).
    *
    * The pair-docs scoping frame is DERIVED IN HERE from (s, d) — r14
    * took it as a parameter while keying the memo on (session, dir)
    * only, so a second caller passing a different scope would silently
    * have received the first caller's persisted frame (verdict r14
    * "what's wrong" note 3). The memo key is now a pure function of
    * the cached frame's inputs by construction.
    */
  private def pairTfidfWtsDF(s: SparkSession, d: String): DataFrame =
    Tables.memo(tfidfCache, (Tables.sessionKey(s), d))({
      val pairs = jaccardPairsCached(s, d)
        .filter(col("jac") >= 0.5).select("ia", "ib")
      val docs = pairs.select(col("ia").as("doc_id"))
        .union(pairs.select(col("ib").as("doc_id"))).distinct()
      val tf = docWordCounts(s, d)
      val nd = tf.select("doc_id").distinct().agg(count(lit(1)).as("nd"))
      // df = rows per word in the distinct-pair frame (each (doc, word)
      // appears exactly once there) — no second pass over occurrences.
      val idf = tf
        .groupBy("word").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nd))
        .select(col("word"), expr(
          "CAST(ROUND(CAST(CAST(ln(CAST(nd AS DOUBLE) / df) AS FLOAT) AS DOUBLE) * 1000) AS BIGINT)")
          .as("idf_knats"))
      tf.join(docs, Seq("doc_id"), "left_semi")
        .join(idf, Seq("word"))
        .select(col("doc_id"), col("word"), (col("tf") * col("idf_knats")).as("wt"))
        .persist()
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy on a normalized fingerprint (sorted word
    // multiset), emitting group size + canonical keeper per group.
    "q_dedup_exact" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          md5(concat_ws(" ", array_sort(split(lower(col("text")), " ")))).as("fp"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n"), min("doc_id").as("keep_id"))
        .orderBy("fp")
    }),

    // Within-doc segment repetition removal (the C4/CCNet "drop
    // duplicated lines" cleanup, distinct from q_quality_repetition
    // which only SCORES repetition): each doc is segmented into SegW-word
    // windows, repeated segments after the first occurrence are dropped
    // (order preserved), and the per-source audit reports how much was
    // cut plus a modular checksum of every cleaned text. The entire
    // cleanup is per-row higher-order functions — ZERO shuffles before
    // the final fixed-width source aggregate, so at 100 TB it is a
    // map-only pass whose cost is the scan itself. The first-occurrence
    // filter is array_position(segs, x) = i + 1: O(n²) in segments per
    // doc, bounded by doc length, never cross-doc. Checksum terms are
    // < 2^20 each, so the per-source sum stays < 2^63 up to ~10^12 docs.
    "q_seg_dedup" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .select(col("source"), split(col("text"), " ").as("w"))
        .withColumn("segs", expr(
          s"""CASE WHEN size(w) DIV $SegW = 0 THEN array()
             |     ELSE transform(sequence(1, size(w) DIV $SegW),
             |            i -> concat_ws(' ', slice(w, (i - 1) * $SegW + 1, $SegW)))
             |END""".stripMargin))
        // O(segs²) first-occurrence membership scan — bounded by doc
        // length, never cross-doc. (A 60-bit-hash variant measured the
        // same solo wall time at sf0.1 — the md5 cost cancels the
        // cheaper compares — and Spark's O(n) array_distinct can't be
        // used because DuckDB's list_distinct scrambles order, which
        // would break the cleaned-text checksum parity.)
        .withColumn("keep", expr(
          "filter(segs, (x, i) -> array_position(segs, x) = i + 1)"))
        .withColumn("ck", expr(s"${h60("concat_ws(' ', keep)")} % 1000003"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("segs")).cast("long")).as("segs_total"),
          sum((size(col("segs")) - size(col("keep"))).cast("long"))
            .as("segs_removed"),
          sum(when(size(col("segs")) > size(col("keep")), 1L).otherwise(0L))
            .as("docs_with_dups"),
          sum("ck").as("checksum"))
        .orderBy("source")
    }),

    // n-gram Jaccard near-dup: candidates = pairs sharing >=1 shingle
    // below the hot-shingle df cutoff; common counts fall out of the same
    // pruned self-join (one pass), hot commons added per-candidate.
    "q_dedup_ngram" -> ((s, d) => {
      jaccardPairsCached(s, d)
        .filter(col("jac") >= 0.5)
        .select("ia", "ib", "jac")
        .orderBy("ia", "ib")
    }),

    // Asymmetric containment: C(A→B) = |A∩B| / |A| catches a short
    // document wholly contained in a longer one (excerpts, quote
    // inflation, boilerplate wrappers) that symmetric Jaccard MISSES
    // when |B| >> |A| — the jaccard_missed flag makes exactly those
    // pairs visible. Same candidate discipline as the Jaccard family
    // (shared persisted pair frame; common/na/nb carried alongside),
    // so zero new scans and no all-pairs exposure; the containment
    // ratio itself is an exact permille grid.
    "q_dedup_containment" -> ((s, d) => {
      jaccardPairsCached(s, d)
        .select(col("ia"), col("ib"), col("common"), col("na"), col("nb"),
          expr("(common * 1000) div na").as("cont_a"),
          expr("(common * 1000) div nb").as("cont_b"),
          (col("jac") < 0.5).as("jaccard_missed"))
        .filter(greatest(col("cont_a"), col("cont_b")) >= 800)
        .orderBy("ia", "ib")
    }),

    // Cross-source duplication matrix: WHERE does the near-duplication
    // come from? Near-dup pairs (the shared persisted Jaccard frame —
    // nothing rescans the corpus) joined to each side's source, counted
    // per unordered source pair. The curation diagnostic that reveals
    // mirror sites and cross-source copying before deciding which
    // source to downweight. Scale: two equi-joins on the doc key
    // (pairs side is candidate-pruned and small), then a hash aggregate
    // bounded by sources^2.
    "q_dedup_sources" -> ((s, d) => {
      val src = Tables.load(s, d, "documents").select(col("doc_id"), col("source"))
      jaccardPairsCached(s, d)
        .filter(col("jac") >= 0.5).select("ia", "ib")
        .join(src.select(col("doc_id").as("ia"), col("source").as("src_a")), Seq("ia"))
        .join(src.select(col("doc_id").as("ib"), col("source").as("src_b")), Seq("ib"))
        .select(least(col("src_a"), col("src_b")).as("source_1"),
          greatest(col("src_a"), col("src_b")).as("source_2"))
        .groupBy("source_1", "source_2").agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_1", "source_2")
    }),

    // TF-IDF cosine re-scoring of the near-dup candidate pairs: the
    // standard lexical similarity an IR pipeline layers over candidate
    // generation. Every quantity is EXACT integer arithmetic — tf counts
    // are ints, idf is FLOAT-collapsed ln(N/df) rounded to a kilo-nat
    // grid, and dot products / norms are order-independent
    // DECIMAL(38,0) sums (wt can reach ~1e9 for long docs with rare
    // terms, so SUM(wt*wt) in BIGINT could silently WRAP on Spark while
    // DuckDB errors). DECIMAL(38,0) keeps both engines exact out to
    // ~1e38 — far past any realistic norm — though the failure mode at
    // that bound still differs: non-ANSI Spark returns a silent NULL on
    // decimal-sum overflow where DuckDB raises, so DECIMAL widens the
    // exact range by ~1e19 rather than making overflow loud. The cosine
    // stays oracle-exact (one IEEE division over exact ints). Pairs come from the shared persisted
    // Jaccard frame; weights ride the shared word frame; nothing here
    // scans the corpus anew.
    "q_tfidf_sim" -> ((s, d) => {
      val pairs = jaccardPairsCached(s, d)
        .filter(col("jac") >= 0.5).select("ia", "ib")
      // Only documents appearing in a near-dup pair contribute to the
      // output (dots and norms are both per-pair-doc), so the weight
      // frame is built for those docs only — IDF stays a global corpus
      // statistic inside pairTfidfWtsDF, but the join + persist + norm
      // aggregate shrink from corpus size to the near-dup population,
      // orders of magnitude smaller at any realistic dup rate.
      //
      // Join strategy (r17): stats plan every join here as SMJ — the
      // pair/norm frames are Filter/Aggregate outputs whose size
      // estimates inherit the cached child's, never under the broadcast
      // threshold — yet none of these equi-joins needs an ordering, so
      // the SMJ plan paid 8 sorts. The pair and norm frames are bounded
      // by the near-dup population (the same bound jaccardPairsCached
      // itself relies on), so they follow the family's size-gated
      // discipline: broadcast under the bigCorpus gate, SHUFFLE_HASH
      // past it. The (ib, word)-keyed weight side is corpus-vocabulary-
      // shaped and is never broadcast — its hint is SHUFFLE_HASH at any
      // scale (hash build instead of two sorts; hints beat auto-
      // broadcast, which never fired for it anyway).
      val big = bigCorpus(s, d)
      // r18 (ADVICE r17): the broadcast is additionally gated on the
      // ACTUAL pair population, not just the doc count — near-dup pairs
      // are O(dups²) regardless of corpus size, so a dup-heavy sub-gate
      // corpus falls back to the sort-free hash join instead of a
      // driver-breaking broadcast. 4M pairs of two longs ≈ tens of MB
      // built; the persisted pair frame makes the count one cached
      // aggregate. The norm frame is bounded by the pair-doc population
      // (≤ 2× pairs), so one gate covers both broadcast sides.
      val smallPairs = !big && jaccardPairCount(s, d) <= 4000000L
      def pick(df: DataFrame): DataFrame =
        if (smallPairs) broadcast(df) else df.hint("shuffle_hash")
      val wts = pairTfidfWtsDF(s, d)
      val norms = wts.groupBy("doc_id")
        .agg(sum(expr("CAST(wt AS DECIMAL(19,0)) * CAST(wt AS DECIMAL(19,0))")).as("n2"))
      val dots = pick(pairs)
        .join(wts.select(col("doc_id").as("ia"), col("word"), col("wt").as("wa")), Seq("ia"))
        .join(wts.select(col("doc_id").as("ib"), col("word"), col("wt").as("wb"))
          .hint("shuffle_hash"), Seq("ib", "word"))
        .groupBy("ia", "ib")
        .agg(sum(expr("CAST(wa AS DECIMAL(19,0)) * CAST(wb AS DECIMAL(19,0))")).as("dot"))
      dots
        .join(pick(norms.select(col("doc_id").as("ia"), col("n2").as("na"))), Seq("ia"))
        .join(pick(norms.select(col("doc_id").as("ib"), col("n2").as("nb"))), Seq("ib"))
        .select(col("ia"), col("ib"),
          expr("CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))")
            .as("cos_tfidf"))
        .orderBy("ia", "ib")
    }),

    // SimHash near-dup: 60-bit signature from per-word md5 hashes, banded
    // 4 x 15 bits; pigeonhole makes the banding COMPLETE for hamming<=3,
    // so the all-pairs oracle matches the banded Spark plan exactly.
    // r15 exact-text collapse (output-invisible): the band self-join and
    // hamming verify run over one signature per DISTINCT text; member
    // pairs expand algebraically — cross pairs inherit the rep pair's
    // hamming, within-group pairs are hamming 0 (identical sigs always
    // collided in every band under the old doc-level join, so the
    // expansion reproduces it exactly while an m-cluster's bucket rows
    // stop fanning m² through the join).
    "q_dedup_simhash" -> ((s, d) => {
      val bands = simhashBands(simhashDF(s, d))
      val repPairs = bands
        .select(col("doc_id").as("ra"), col("simhash").as("ha"), col("band"), col("bsig"))
        .join(bands.select(col("doc_id").as("rb"), col("simhash").as("hb"),
          col("band"), col("bsig")), Seq("band", "bsig"))
        .filter(col("ra") < col("rb"))
        .select(col("ra"), col("rb"), expr("bit_count(ha ^ hb)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
      val big = bigCorpus(s, d)
      val memb = docGroupsDF(s, d)
      val cross = repPairs
        .join(hb(memb.select(col("rep").as("ra"), col("doc_id").as("a")), big), Seq("ra"))
        .join(hb(memb.select(col("rep").as("rb"), col("doc_id").as("b")), big), Seq("rb"))
        .select(least(col("a"), col("b")).as("ia"),
          greatest(col("a"), col("b")).as("ib"), col("hamming"))
      val within = memb.select(col("rep"), col("doc_id").as("a"))
        .join(hb(memb.select(col("rep"), col("doc_id").as("b")), big), Seq("rep"))
        .filter(col("a") < col("b"))
        .select(col("a").as("ia"), col("b").as("ib"),
          lit(0).cast("int").as("hamming"))
      cross.unionByName(within).orderBy("ia", "ib")
    }),

    // Incremental ingest dedup: the newly-arrived batch (every IncrMod-th
    // doc) checked against the existing corpus index through the same
    // banded SimHash structure — band-bucket equi-join generates
    // candidates (bounded buckets, never a batch x corpus product), exact
    // hamming verifies. This is the continuous-ingest shape: at 100 TB
    // the corpus side is a pre-built signature index (written once,
    // partitioned by band), and each arriving batch joins bucket-to-
    // bucket against it instead of re-deduplicating the whole corpus.
    // r15 exact-text collapse: the batch/corpus split (doc_id % IncrMod)
    // cuts ACROSS duplicate groups, so the expansion is algebraic
    // COUNTING rather than pair expansion — the rep-level band join
    // keeps SELF pairs (ra = rb, hamming 0: a batch member's own
    // group's corpus members are matches), and each batch member's
    // (n_matches, keeper) is the sum/min of the matching groups'
    // corpus-member counts/minima. Output identical to the member-level
    // join (groups partition documents); an m-cluster's band bucket
    // stops fanning batch×corpus within itself.
    "q_dedup_incremental" -> ((s, d) => {
      val memb = docGroupsDF(s, d)
      val corpusStats = memb.filter(col("doc_id") % IncrMod =!= 0)
        .groupBy("rep")
        .agg(count(lit(1)).as("nc"), min("doc_id").as("minc"))
      val bands = simhashBands(simhashDF(s, d))
      // directional rep matches INCLUDING self — no ra < rb filter
      // shuffle_hash (r17): the band frame's stats never qualify for
      // broadcast, so this equi-join planned as SMJ — two sorts for a
      // join needing no ordering at any scale.
      val rp = bands
        .select(col("doc_id").as("ra"), col("simhash").as("ha"), col("band"), col("bsig"))
        .join(bands.select(col("doc_id").as("rb"), col("simhash").as("hb"),
          col("band"), col("bsig")).hint("shuffle_hash"), Seq("band", "bsig"))
        .select(col("ra"), col("rb"), expr("bit_count(ha ^ hb)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
      val g = rp
        .join(corpusStats.withColumnRenamed("rep", "rb"), Seq("rb"))
        .groupBy("ra")
        .agg(sum("nc").as("n_matches"), min("minc").as("keeper"))
      memb.filter(col("doc_id") % IncrMod === 0)
        .select(col("rep").as("ra"), col("doc_id").as("ia"))
        // shuffle_hash: g is the batch-rep aggregate (stats-blind, never
        // broadcast-planned); the left join needs no ordering (r17)
        .join(g.hint("shuffle_hash"), Seq("ra"), "left")
        .select(col("ia").as("doc_id"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          col("keeper"),
          col("keeper").isNotNull.as("is_dup"))
        .orderBy("doc_id")
    }),

    // Dedup clustering: connected components over the >=0.5-Jaccard pair
    // graph — each near-dup cluster labeled by its minimum doc_id (the
    // canonical keeper). Min-label propagation in Spark; the oracle
    // reproduces it with a recursive transitive-closure CTE.
    "q_dedup_clusters" -> ((s, d) => {
      val pairs = jaccardPairsCached(s, d)
        .filter(col("jac") >= 0.5)
        .select("ia", "ib")
      graft.ops.ConnectedComponents.labelPropagate(s, pairs)
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
        .orderBy("doc_id")
    }),

    // MinHash-LSH near-dup: 16 portable permutations over shingle hashes,
    // 4 bands of 4 rows generate candidates; exact-Jaccard verification
    // touches candidates only. Output = verified candidates with jac.
    // r15 exact-text collapse (output-invisible): signatures, band
    // buckets, and verification all run over one rep per DISTINCT text
    // (identical texts have identical signatures, so they always
    // band-collided pairwise under the old doc-level join); member
    // pairs expand algebraically — cross pairs inherit the verified rep
    // jac, within-group pairs are jac = 1.0 for every group whose rep
    // has at least one shingle (zero-shingle docs have no signature
    // rows on either formulation).
    "q_dedup_minhash" -> ((s, d) => {
      val m = Tables.memo(minhashCache, (Tables.sessionKey(s), d))({
        val sh = repShingleDF(s, d).withColumn("h31", expr(s"sh % $Prime"))
        val mins = (0 until NumPerms).map(i =>
          min(expr(s"(${permA(i)}L * h31 + ${permB(i)}L) % $Prime")).as(s"m$i"))
        sh.groupBy("doc_id").agg(mins.head, mins.tail: _*).persist()
      })
      val bands = m
        .select(col("doc_id") +: (0 until 4).map(bi =>
          concat_ws("_", (0 until 4).map(j => col(s"m${bi * 4 + j}")): _*).as(s"b$bi")): _*)
        .select(col("doc_id"),
          explode(array((0 until 4).map(bi =>
            struct(lit(bi).as("band"), col(s"b$bi").as("bsig"))): _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bsig").as("bsig"))
      // shuffle_hash (r17): the exploded band frame's stats never qualify
      // for a broadcast at any sf, so this self-join planned as SMJ and
      // paid two sorts of the band frame — a pure equi-join on
      // (band, bsig) that needs no ordering at any scale.
      val repCand = bands.select(col("doc_id").as("ia"), col("band"), col("bsig"))
        .join(bands.select(col("doc_id").as("ib"), col("band"), col("bsig"))
          .hint("shuffle_hash"), Seq("band", "bsig"))
        .filter(col("ia") < col("ib"))
        .select("ia", "ib").distinct()
      val repJac = verifyJaccard(repShingleDF(s, d), repCand)
        .filter(col("jac") >= 0.3)
        .withColumnRenamed("ia", "ra").withColumnRenamed("ib", "rb")
      val big = bigCorpus(s, d)
      val memb = docGroupsDF(s, d)
      val cross = repJac
        .join(hb(memb.select(col("rep").as("ra"), col("doc_id").as("a")), big), Seq("ra"))
        .join(hb(memb.select(col("rep").as("rb"), col("doc_id").as("b")), big), Seq("rb"))
        .select(least(col("a"), col("b")).as("ia"),
          greatest(col("a"), col("b")).as("ib"), col("jac"))
      val within = memb.select(col("rep"), col("doc_id").as("a"))
        .join(hb(memb.select(col("rep"), col("doc_id").as("b")), big), Seq("rep"))
        .filter(col("a") < col("b"))
        .join(m.select(col("doc_id").as("rep")), Seq("rep"), "left_semi")
        .select(col("a").as("ia"), col("b").as("ib"), lit(1.0).as("jac"))
      cross.unionByName(within).orderBy("ia", "ib")
    }),

    // Exact-substring dedup CLEANUP — the removal step of suffix-array
    // substring dedup (Lee et al. 2022, "Deduplicating Training Data
    // Makes Language Models Better") re-expressed join-first: every
    // SubstrK-word span occurring in >= 2 distinct documents is removed
    // from every document except the smallest doc_id holding it (the
    // keeper keeps ALL its occurrences), and the cleaned text is
    // reassembled from the surviving token positions. Overlapping
    // flagged spans merge for free through the position-set union.
    // Plan shape: one explode (doc_id, pos, gram) -> gram-keyed stats
    // aggregate -> equi-join back -> K-wide bounded position explode ->
    // per-doc position-set aggregate -> one join to the docs frame.
    // Every stage is LINEAR in corpus grams with equi-join keys only —
    // no pair join exists anywhere, so unlike pairwise near-dup a
    // boilerplate gram in 10^6 docs makes 10^6 flagged rows, never
    // 10^12 pairs. The gram is md5-folded to the portable 60-bit hash
    // BEFORE the shuffle (8-byte keys instead of ~50-byte strings, the
    // same h60 grid every dedup query shares), so both the stats
    // aggregate and the join-back move fixed-width integers — and the
    // oracle folds identically, keeping the compare exact.
    "q_substr_dedup" -> ((s, d) => {
      val K = SubstrK
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      // The gram frame feeds BOTH the stats aggregate and the join-back;
      // persist one copy per sf dir (the wordDF/shingleDF discipline) so
      // the md5 fold runs once, not once per plan reference.
      val grams = Tables.memo(substrGramCache, (Tables.sessionKey(s), d))({
        docs
          .filter(size(col("ws")) >= K)
          .select(col("doc_id"), col("ws"),
            explode(expr(s"sequence(1, size(ws) - ${K - 1})")).as("pos"))
          .select(col("doc_id"), col("pos"),
            expr(h60(s"array_join(slice(ws, pos, $K), ' ')")).as("gh"))
          .persist()
      })
      val st = grams.groupBy("gh")
        .agg(min("doc_id").as("keeper"), countDistinct("doc_id").as("df"))
        .filter(col("df") >= 2)
        .select("gh", "keeper")
      val cov = grams.join(st, Seq("gh"))
        .filter(col("doc_id") > col("keeper"))
        .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${K - 1})")).as("cp"))
        .groupBy("doc_id").agg(collect_set("cp").as("cov"))
      docs.join(cov, Seq("doc_id"))
        .select(col("doc_id"), size(col("ws")).as("n_tokens"),
          size(col("cov")).as("n_removed"),
          expr("""array_join(transform(
                 |  filter(sequence(1, size(ws)), p -> NOT array_contains(cov, p)),
                 |  p -> element_at(ws, p)), ' ')""".stripMargin).as("cleaned"))
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          md5(col("cleaned")).as("cleaned_md5"),
          substring(col("cleaned"), 1, 60).as("cleaned_head"))
        .orderBy("doc_id")
    })
  )

  /** Duplicated-span gram width (words) for q_substr_dedup. */
  private[queries] val SubstrK = 8

  // ---- DuckDB oracles (machine-generated to share the exact constants) ----

  private val duckShingles: String = {
    val w = "string_split(lower(text), ' ')"
    s"list_distinct(list_transform(range(1, greatest(len($w) - 1, 1)), " +
      s"i -> $w[i] || ' ' || $w[i + 1] || ' ' || $w[i + 2]))"
  }

  private def duckH60(c: String): String =
    s"CAST('0x' || substr(md5($c), 1, 15) AS BIGINT)"

  private[queries] val duckShingleCte =
    s"""shs AS (SELECT doc_id, UNNEST($duckShingles) AS shingle FROM documents),
       |sh AS (SELECT doc_id, ${duckH60("shingle")} AS sh FROM shs),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  // Replays the hot-shingle guard with the same policy as
  // maxShingleDocFreq: the SPARK_GRAFT_MAX_SHINGLE_DF override inlined
  // as a literal when set (oracle parity survives tighter policies —
  // verdict r14 advice), else max(1024, 8·⌊√N⌋) derived in SQL.
  private def duckCutoff: String =
    sys.env.get("SPARK_GRAFT_MAX_SHINGLE_DF").map(v => s"${v.toLong}")
      .getOrElse("GREATEST(1024, 8 * CAST(FLOOR(SQRT(" +
        "(SELECT COUNT(*) FROM documents))) AS BIGINT))")

  // Replays the r15 exact-duplicate collapse: candidates are generated
  // at the REP level (one rep per byte-identical lowercased text, df
  // counted over distinct texts) and expanded to member pairs; every
  // same-text pair is a candidate unconditionally. Verification (the
  // common/jac CTEs downstream) runs over the member-level shingle
  // frame and is inner-joined, so zero-shingle same-text pairs drop
  // out exactly as the Spark side's repCnt inner join drops them.
  //
  // r17 (verdict r16 item 4): when SPARK_GRAFT_RETAIN_RAREST=1 the
  // oracle replays the retention rule too — each rep's globally rarest
  // PAIRABLE shingle (min (df, sh) over df >= 2, kept only when that
  // rarest is itself hot) becomes one unconditional candidate key,
  // exactly jaccardPairs's retention branch. Candidates union in at the
  // rep level; scoring downstream recounts EVERY candidate pair's
  // common over the full shingle sets, which equals the Spark side's
  // scored ∪ extraScored (an extra pair shares no cold shingle by the
  // anti-join, so its full common IS its hot-correction count). With
  // the flag unset the SQL below is byte-identical to r16's.
  private def retainRarestOn: Boolean =
    sys.env.get("SPARK_GRAFT_RETAIN_RAREST").contains("1")
  private def duckRarestCtes: String =
    s"""rdf AS (SELECT s.doc_id, s.sh, dfc.df FROM shrep s JOIN dfc USING (sh)
       |        WHERE dfc.df >= 2),
       |rst AS (SELECT doc_id, sh, df,
       |          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY df, sh) AS rn
       |        FROM rdf),
       |rarest AS (SELECT doc_id, sh FROM rst WHERE rn = 1 AND df >= $duckCutoff),
       |""".stripMargin
  private def duckRcand: String =
    if (!retainRarestOn)
      """rcand AS (SELECT DISTINCT a.doc_id AS ra, b.doc_id AS rb
        |          FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id),""".stripMargin
    else
      s"""${duckRarestCtes}rcand AS (
         |  SELECT DISTINCT a.doc_id AS ra, b.doc_id AS rb
         |  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  UNION
         |  SELECT a.doc_id AS ra, b.doc_id AS rb
         |  FROM rarest a JOIN rarest b ON a.sh = b.sh AND a.doc_id < b.doc_id),""".stripMargin
  private def duckCandCte =
    s"""fps AS (SELECT doc_id, md5(lower(text)) AS fp FROM documents),
       |grp AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY fp) AS rep FROM fps),
       |shrep AS (SELECT s.doc_id, s.sh FROM sh s JOIN grp g
       |          ON s.doc_id = g.doc_id AND g.doc_id = g.rep),
       |dfc AS (SELECT sh, COUNT(*) AS df FROM shrep GROUP BY sh),
       |shf AS (SELECT s.doc_id, s.sh FROM shrep s JOIN dfc USING (sh)
       |        WHERE dfc.df < $duckCutoff),
       |$duckRcand
       |cand AS (
       |  SELECT LEAST(ga.doc_id, gb.doc_id) AS ia,
       |         GREATEST(ga.doc_id, gb.doc_id) AS ib
       |  FROM rcand JOIN grp ga ON ga.rep = rcand.ra
       |             JOIN grp gb ON gb.rep = rcand.rb
       |  UNION
       |  SELECT a.doc_id AS ia, b.doc_id AS ib
       |  FROM grp a JOIN grp b ON a.rep = b.rep AND a.doc_id < b.doc_id)""".stripMargin

  private def duckVerify(candCte: String, threshold: Double): String =
    s"""common AS (
       |  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS common
       |  FROM sh a JOIN cand ON a.doc_id = cand.ia
       |            JOIN sh b ON b.doc_id = cand.ib AND b.sh = a.sh
       |  GROUP BY 1, 2),
       |jacs AS (
       |  SELECT ia, ib, CAST(common AS DOUBLE) / (ca.n + cb.n - common) AS jac
       |  FROM common JOIN cnt ca ON ia = ca.doc_id JOIN cnt cb ON ib = cb.doc_id)
       |SELECT ia, ib, jac FROM jacs WHERE jac >= $threshold ORDER BY ia, ib""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(array_to_string(list_sort(string_split(lower(text), ' ')), ' ')) AS fp,
        |  COUNT(*) AS n, MIN(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "q_seg_dedup" ->
      s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS words
         |  FROM documents),
         |s AS (SELECT doc_id, source,
         |    CASE WHEN len(words) // $SegW = 0 THEN CAST([] AS VARCHAR[])
         |         ELSE [array_to_string(words[(i - 1) * $SegW + 1 : (i - 1) * $SegW + $SegW], ' ')
         |               FOR i IN generate_series(1, len(words) // $SegW)] END AS segs
         |  FROM w),
         |k AS (SELECT doc_id, source, segs,
         |    list_filter(segs, (x, i) -> list_position(segs, x) = i) AS keep FROM s)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(len(segs)) AS BIGINT) AS segs_total,
         |  CAST(SUM(len(segs) - len(keep)) AS BIGINT) AS segs_removed,
         |  CAST(SUM(CASE WHEN len(segs) > len(keep) THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_with_dups,
         |  CAST(SUM(${duckH60("array_to_string(keep, ' ')")} % 1000003) AS BIGINT)
         |    AS checksum
         |FROM k GROUP BY source ORDER BY source""".stripMargin,

    "q_dedup_ngram" ->
      s"""WITH $duckShingleCte,
         |$duckCandCte,
         |${duckVerify("cand", 0.5)}""".stripMargin,

    "q_dedup_containment" ->
      s"""WITH $duckShingleCte,
         |$duckCandCte,
         |common AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS common
         |  FROM sh a JOIN cand ON a.doc_id = cand.ia
         |            JOIN sh b ON b.doc_id = cand.ib AND b.sh = a.sh
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT ia, ib, common, ca.n AS na, cb.n AS nb,
         |    (common * 1000) // ca.n AS cont_a,
         |    (common * 1000) // cb.n AS cont_b,
         |    CAST(common AS DOUBLE) / (ca.n + cb.n - common) < 0.5 AS jaccard_missed
         |  FROM common JOIN cnt ca ON ia = ca.doc_id
         |              JOIN cnt cb ON ib = cb.doc_id)
         |SELECT ia, ib, common, na, nb, cont_a, cont_b, jaccard_missed
         |FROM sc WHERE GREATEST(cont_a, cont_b) >= 800
         |ORDER BY ia, ib""".stripMargin,

    "q_dedup_sources" ->
      s"""WITH $duckShingleCte,
         |$duckCandCte,
         |common AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS common
         |  FROM sh a JOIN cand ON a.doc_id = cand.ia
         |            JOIN sh b ON b.doc_id = cand.ib AND b.sh = a.sh
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT ia, ib FROM common
         |  JOIN cnt ca ON ia = ca.doc_id JOIN cnt cb ON ib = cb.doc_id
         |  WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.5),
         |ds AS (SELECT doc_id, source FROM documents)
         |SELECT least(sa.source, sb.source) AS source_1,
         |  greatest(sa.source, sb.source) AS source_2,
         |  COUNT(*) AS n_pairs
         |FROM pairs p
         |JOIN ds sa ON p.ia = sa.doc_id
         |JOIN ds sb ON p.ib = sb.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_tfidf_sim" ->
      s"""WITH $duckShingleCte,
         |$duckCandCte,
         |common AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS common
         |  FROM sh a JOIN cand ON a.doc_id = cand.ia
         |            JOIN sh b ON b.doc_id = cand.ib AND b.sh = a.sh
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT ia, ib FROM common
         |  JOIN cnt ca ON ia = ca.doc_id JOIN cnt cb ON ib = cb.doc_id
         |  WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.5),
         |w AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS word
         |      FROM documents),
         |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
         |nd AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM w),
         |idf AS (
         |  SELECT word,
         |    CAST(ROUND(CAST(CAST(ln(CAST(nd AS DOUBLE) / df) AS REAL) AS DOUBLE) * 1000) AS BIGINT) AS idf_knats
         |  FROM (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY word)
         |  CROSS JOIN nd),
         |wts AS (SELECT doc_id, word, CAST(tf * idf_knats AS BIGINT) AS wt
         |        FROM tf JOIN idf USING (word)),
         |norms AS (SELECT doc_id,
         |            SUM(CAST(wt AS DECIMAL(19,0)) * CAST(wt AS DECIMAL(19,0))) AS n2
         |          FROM wts GROUP BY doc_id),
         |dots AS (
         |  SELECT p.ia, p.ib,
         |    SUM(CAST(a.wt AS DECIMAL(19,0)) * CAST(b.wt AS DECIMAL(19,0))) AS dot
         |  FROM pairs p JOIN wts a ON a.doc_id = p.ia
         |               JOIN wts b ON b.doc_id = p.ib AND b.word = a.word
         |  GROUP BY 1, 2)
         |SELECT d.ia, d.ib,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos_tfidf
         |FROM dots d JOIN norms na ON d.ia = na.doc_id
         |            JOIN norms nb ON d.ib = nb.doc_id
         |ORDER BY ia, ib""".stripMargin,

    "q_dedup_simhash" -> {
      val sums = (0 until SimBits)
        .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i")
        .mkString(",\n    ")
      val build = (0 until SimBits)
        .map(i => s"CASE WHEN s$i > 0 THEN ${1L << i} ELSE 0 END")
        .mkString(" + ")
      // The banding is complete for hamming<=3, so the oracle can take
      // the direct all-pairs form of the same predicate.
      s"""WITH w AS (
         |  SELECT doc_id, ${duckH60("UNNEST(string_split(lower(text), ' '))")} AS h
         |  FROM documents),
         |s AS (SELECT doc_id,
         |    $sums
         |  FROM w GROUP BY doc_id),
         |sig AS (SELECT doc_id, $build AS simhash FROM s)
         |SELECT a.doc_id AS ia, b.doc_id AS ib,
         |       bit_count(xor(a.simhash, b.simhash)) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY ia, ib""".stripMargin
    },

    "q_dedup_incremental" -> {
      val sums = (0 until SimBits)
        .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i")
        .mkString(",\n    ")
      val build = (0 until SimBits)
        .map(i => s"CASE WHEN s$i > 0 THEN ${1L << i} ELSE 0 END")
        .mkString(" + ")
      // Banding is complete for hamming<=3, so the oracle takes the
      // direct batch x corpus form of the same predicate.
      s"""WITH w AS (
         |  SELECT doc_id, ${duckH60("UNNEST(string_split(lower(text), ' '))")} AS h
         |  FROM documents),
         |s AS (SELECT doc_id,
         |    $sums
         |  FROM w GROUP BY doc_id),
         |sig AS (SELECT doc_id, $build AS simhash FROM s),
         |m AS (
         |  SELECT a.doc_id AS ia, COUNT(*) AS n_matches, MIN(b.doc_id) AS keeper
         |  FROM sig a JOIN sig b
         |    ON a.doc_id % $IncrMod = 0 AND b.doc_id % $IncrMod <> 0
         |   AND bit_count(xor(a.simhash, b.simhash)) <= 3
         |  GROUP BY 1)
         |SELECT sig.doc_id AS doc_id, COALESCE(n_matches, 0) AS n_matches,
         |  keeper, keeper IS NOT NULL AS is_dup
         |FROM sig LEFT JOIN m ON sig.doc_id = m.ia
         |WHERE sig.doc_id % $IncrMod = 0
         |ORDER BY doc_id""".stripMargin
    },

    "q_dedup_clusters" ->
      s"""WITH $duckShingleCte,
         |$duckCandCte,
         |common AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS common
         |  FROM sh a JOIN cand ON a.doc_id = cand.ia
         |            JOIN sh b ON b.doc_id = cand.ib AND b.sh = a.sh
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT ia, ib FROM common
         |  JOIN cnt ca ON ia = ca.doc_id JOIN cnt cb ON ib = cb.doc_id
         |  WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.5),
         |edges AS (SELECT ia AS a, ib AS b FROM pairs
         |          UNION SELECT ib, ia FROM pairs),
         |reach AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |) -- RECURSIVE closure; components are tiny so this terminates fast
         |SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
         |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin
        .replace("WITH shs AS", "WITH RECURSIVE shs AS"),
    "q_dedup_minhash" -> {
      val mins = (0 until NumPerms)
        .map(i => s"MIN((${permA(i)} * h31 + ${permB(i)}) % $Prime) AS m$i")
        .mkString(",\n    ")
      val bandRows = (0 until 4).map { bi =>
        val sig = (0 until 4).map(j => s"CAST(m${bi * 4 + j} AS VARCHAR)")
          .mkString(" || '_' || ")
        s"SELECT doc_id, $bi AS band, $sig AS bsig FROM m"
      }.mkString("\nUNION ALL\n")
      s"""WITH $duckShingleCte,
         |hs AS (SELECT doc_id, sh % $Prime AS h31 FROM sh),
         |m AS (SELECT doc_id,
         |    $mins
         |  FROM hs GROUP BY doc_id),
         |bands AS (
         |$bandRows),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
         |${duckVerify("cand", 0.3)}""".stripMargin
    },

    "q_substr_dedup" -> {
      val k = SubstrK
      // DuckDB range(a, b) is stop-exclusive; list slices are 1-based
      // inclusive like the Spark-side slice(ws, pos, K).
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
         |g AS (SELECT doc_id, ws, UNNEST(range(1, len(ws) - ${k - 2})) AS pos
         |      FROM d WHERE len(ws) >= $k),
         |gr AS (SELECT doc_id, pos,
         |         ${duckH60(s"array_to_string(ws[pos:pos + ${k - 1}], ' ')")} AS gh
         |       FROM g),
         |st AS (SELECT gh, MIN(doc_id) AS keeper FROM gr
         |       GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
         |fl0 AS (SELECT gr.doc_id, gr.pos FROM gr JOIN st USING (gh)
         |        WHERE gr.doc_id > st.keeper),
         |flc AS (SELECT doc_id, UNNEST(range(pos, pos + $k)) AS cp FROM fl0),
         |fl AS (SELECT DISTINCT doc_id, cp FROM flc),
         |cov AS (SELECT doc_id, list(cp) AS cov FROM fl GROUP BY doc_id),
         |res AS (SELECT d.doc_id, len(d.ws) AS n_tokens, len(c.cov) AS n_removed,
         |          -- a fully-covered doc cleans to the empty string; DuckDB's
         |          -- array_to_string of an empty list is NULL, Spark's
         |          -- array_join is '' — align on ''
         |          COALESCE(array_to_string(list_transform(
         |            list_filter(range(1, len(d.ws) + 1), p -> NOT list_contains(c.cov, p)),
         |            p -> d.ws[p]), ' '), '') AS cleaned
         |        FROM d JOIN cov c ON d.doc_id = c.doc_id)
         |SELECT doc_id, n_tokens, n_removed, md5(cleaned) AS cleaned_md5,
         |  substr(cleaned, 1, 60) AS cleaned_head
         |FROM res ORDER BY doc_id""".stripMargin
    }
  )
}
