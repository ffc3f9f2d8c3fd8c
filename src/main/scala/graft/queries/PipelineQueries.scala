package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import graft.ops.Multimodal
import graft.streaming.EventStreams

/** Multimodal + event-stream operators with DuckDB oracles: the decode
  * stub derives features from bytes only, so the oracle reconstructs them
  * from octet lengths; the streaming transforms run here in batch mode
  * over `events` (identical code plans as a stream — see StreamingSpec
  * for the readStream path) and the oracles replay them as windowed SQL.
  */
object PipelineQueries {

  /** Chunking parameters: max tokens per training chunk and the overlap
    * carried between consecutive chunks (stride = max - overlap).
    */
  /** Frame geometry for q_multimodal_framesample, interpolated into BOTH
    * the Spark call and the oracle so the two cannot drift.
    */
  private[queries] val FrameSize = 32
  private[queries] val FrameStride = 4

  /** Output raster length for q_multimodal_resize; shared with the oracle. */
  private[queries] val ResizeOut = 256

  /** Perceptual-hash geometry for q_multimodal_phash: a PhPix-pixel
    * sampled raster becomes a PhPix-bit hash (bit j = pixel j strictly
    * above the raster mean, integer-exact as px*PhPix > sum), banded
    * 4 x PhBandBits like the text SimHash — pigeonhole-complete for
    * hamming <= 3. Shared with the oracle.
    */
  private[queries] val PhPix = 60
  private[queries] val PhBandBits = 15

  /** Count-Min Sketch geometry and probe words, shared with the oracle.
    * Width is fixed at 256: row r's bucket is byte r of the 60-bit
    * md5-prefix hash, counting from the LOW end — `(h >> 8r) & 255`,
    * i.e. bits [8r, 8r+8) — so one digest yields all CmsD row-hashes.
    * zzz_absent never occurs — its estimate exposes pure collision mass.
    */
  private[queries] val CmsD = 4
  private[queries] val CmsProbes =
    Seq("join", "window", "hash", "the", "zzz_absent")

  private[queries] val ChunkMax = 32
  private[queries] val ChunkOverlap = 8

  /** Bucket count for the co-located-join layout (q_bucket_join). */
  private[queries] val BucketN = 8

  private val bucketCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), (String, String)])

  /** Write orders + customer ONCE per (session, sf dir) as external
    * bucketed tables on their join key — `bucketBy` + `sortBy` +
    * `saveAsTable` is the only Spark surface that records bucket
    * metadata the planner can use. Returns the registered table names.
    */
  private[queries] def bucketTables(s: SparkSession, d: String): (String, String) =
    Tables.memo(bucketCache, (Tables.sessionKey(s), d))({
      val slug = d.replaceAll("[^A-Za-z0-9]+", "_")
      val ot = s"graft_b_orders_$slug"
      val ct = s"graft_b_customer_$slug"
      Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(BucketN, "o_custkey").sortBy("o_custkey")
        .option("path", s"/tmp/graft_bucket_${slug}_orders")
        .mode("overwrite").saveAsTable(ot)
      Tables.load(s, d, "customer")
        .select("c_custkey", "c_mktsegment")
        .write.bucketBy(BucketN, "c_custkey").sortBy("c_custkey")
        .option("path", s"/tmp/graft_bucket_${slug}_customer")
        .mode("overwrite").saveAsTable(ct)
      (ot, ct)
    })

  /** HyperLogLog geometry: m = 64 registers (6-bit bucket carve of the
    * 60-bit portable hash, leaving 54 bits for the rank), alpha_64 =
    * 0.709 (Flajolet et al. 2007), and the raw estimator only — no
    * small/large-range correction, which keeps the estimate a single
    * deterministic expression both engines compute identically.
    */
  private[queries] val HllM = 64
  private[queries] val HllAlpha = "0.709"

  /** Histogram-quantile geometry: fixed price buckets and the probed
    * percentiles, shared with the oracle.
    */
  private[queries] val QuantBucket = 100
  private[queries] val QuantPcts = Seq(50, 90, 99)

  /** Z-order (Morton) layout geometry: ZBits bits per dimension
    * interleaved into a 2*ZBits-bit key, bucketed by its top bits into
    * 2^ZBits / ZBucketDiv range files. The interleave is unrolled into
    * one static integer expression per dialect — identical bit math, no
    * UDF — via [[zInterleave]].
    */
  private[queries] val ZBits = 8
  private[queries] val ZBucketDiv = 256

  /** Heavy-hitter count reported by q_skew_audit; shared with the oracle. */
  private[queries] val SkewTopK = 10

  /** (doc_id, chunk_id) packing base for q_para_dedup's first-occurrence
    * key — safe while chunks-per-doc < ParaPack (ChunkMax-token windows
    * of the synthetic docs top out far below it); shared with the oracle.
    */
  private[queries] val ParaPack = 100000L

  /** Shared oracle CTE text building (sig, bands) for the perceptual-
    * hash queries — interpolated into BOTH phash oracles so the hash
    * and banding cannot drift between them.
    */
  private def phashOracleCte: String =
    s"""d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS nc
       |           FROM documents WHERE length(text) > 0),
       |px AS (SELECT doc_id,
       |    list_transform(range(0, $PhPix),
       |      j -> CAST(unicode(substr(text, CAST((j * nc) // $PhPix AS INT) + 1, 1)) AS BIGINT)) AS pxs
       |  FROM d),
       |st AS (SELECT doc_id, pxs, list_aggregate(pxs, 'sum') AS ps FROM px),
       |sig AS (SELECT doc_id,
       |    list_aggregate(list_transform(range(0, $PhPix),
       |      j -> CASE WHEN pxs[CAST(j AS INT) + 1] * $PhPix > ps
       |           THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END),
       |      'sum') AS phash
       |  FROM st),
       |bands AS (SELECT doc_id, phash, b,
       |    (phash >> (CAST(b AS INT) * $PhBandBits)) & ${(1 << PhBandBits) - 1} AS bsig
       |  FROM sig, UNNEST(range(0, 4)) AS t(b))""".stripMargin

  private val phashCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap
    .empty[(Int, String), DataFrame])

  /** Persisted (doc_id, phash) perceptual-signature frame over the
    * media payload tier — the image analogue of the text SimHash
    * signature frame. The "decode" is the same deterministic stub
    * sampling q_multimodal_resize uses (a real codec would replace
    * only the pixel source); the hash build is pure codegen
    * higher-order functions, integer-exact, shared verbatim with the
    * oracle. One small row per doc; sits on both sides of the band
    * join.
    */
  private def phashDF(s: SparkSession, d: String): DataFrame =
    Tables.memo(phashCache, (Tables.sessionKey(s), d))({
      // one-pass codegen kernel (graft.ops.PhashOps) — the former
      // transform/aggregate HOF pipeline evaluated interpreted
      // (CodegenFallback) with 64 O(n) substr probes per document;
      // bit-for-bit identical to the oracle's SQL formulation, pinned
      // by the unchanged q_multimodal_phash* oracle rows
      graft.ops.PhashFunctions.register(s)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .where(length(col("text")) > 0)
        .withColumn("phash", expr(s"graft_phash(text, $PhPix)"))
        .select("doc_id", "phash")
        .persist()
    })

  private val paraChunkCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap
    .empty[(Int, String), DataFrame])

  /** The paragraph fingerprint index — non-overlapping ChunkMax-token
    * windows with md5 fingerprints and the packed first-occurrence key —
    * persisted per (session, sf dir) like the dedup shingle frames: the
    * dedup plan references it twice (keeper aggregate + join-back), and
    * it is the corpus-side index an incremental paragraph dedup probes.
    */
  private def paraChunksDF(s: SparkSession, d: String): DataFrame =
    Tables.memo(paraChunkCache, (Tables.sessionKey(s), d))({
      graft.ops.Curation.chunkText(
          Tables.load(s, d, "documents"), "doc_id", "text",
          maxTokens = ChunkMax, overlap = 0)
        .select(col("doc_id"), col("chunk_id"), col("fp"))
        .withColumn("ck", expr(s"doc_id * $ParaPack + chunk_id"))
        .persist()
    })

  /** Arrival-jitter span for q_stream_late's simulated reordering:
    * events within LateJitter positions of each other may swap arrival
    * order. Shared with the oracle.
    */
  private[queries] val LateJitter = 64

  /** Portable 60-bit hash, Spark spelling (same as DedupQueries). */
  private def h60p(c: String): String =
    s"CAST(conv(substr(md5($c), 1, 15), 16, 10) AS BIGINT)"

  /** Theta/KMV sketch size for q_theta_setops (union/intersection set
    * operations); shared with the oracle. The estimate expression below
    * the CASE is interpolated into BOTH dialects verbatim so the double
    * arithmetic (decimal-exact 31·2^60 numerator, one double divide)
    * cannot drift between engines.
    */
  private[queries] val ThetaK = 32

  /** Bit-interleave expression for dialect `shl`/`shr` operators:
    * sum over i of ((x>>i)&1)<<2i + ((y>>i)&1)<<(2i+1).
    */
  private[queries] def zInterleave(x: String, y: String,
      shl: (String, Int) => String, shr: (String, Int) => String): String =
    (0 until ZBits).map { i =>
      s"${shl(s"(${shr(x, i)} & 1)", 2 * i)} + ${shl(s"(${shr(y, i)} & 1)", 2 * i + 1)}"
    }.mkString("(", " + ", ")")

  private[queries] def zSpark(x: String, y: String): String =
    zInterleave(x, y, (e, n) => s"shiftleft($e, $n)", (e, n) => s"shiftright($e, $n)")

  private[queries] def zDuck(x: String, y: String): String =
    zInterleave(x, y, (e, n) => s"($e << $n)", (e, n) => s"($e >> $n)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary media column + batched per-partition decode (stubbed kernel).
    "q_multimodal_decode" -> ((s, d) => {
      Multimodal.decodeFeatures(s, Tables.load(s, d, "documents"))
        .orderBy("doc_id")
    }),

    // Frame sampling over the binary payload tier: every FrameStride-th
    // FrameSize-byte frame summarized by the batched kernel (video
    // keyframe-sampling plumbing; real codec seeks would replace the
    // stub summary only). Geometry constants shared with the oracle.
    "q_multimodal_framesample" -> ((s, d) => {
      graft.ops.Multimodal.sampleFrames(s, Tables.load(s, d, "documents"),
          frameSize = FrameSize, stride = FrameStride)
        .orderBy("doc_id", "frame_id")
    }),

    // Nearest-neighbor resize over the binary payload tier: every doc's
    // payload mapped to a fixed ResizeOut-byte raster by the batched
    // kernel (image-resize plumbing; a real codec + interpolation would
    // replace only the stub sampling). Geometry shared with the oracle.
    "q_multimodal_resize" -> ((s, d) => {
      Multimodal.resizeMedia(s, Tables.load(s, d, "documents"), outLen = ResizeOut)
        .orderBy("doc_id")
    }),

    // Image near-duplicate search over the media payload tier:
    // perceptual hash (pixel-above-mean bits over the stub-decoded
    // raster) -> 4 x 15-bit band buckets -> exact hamming verify on
    // the candidates only — the text SimHash's candidate discipline on
    // the image tier. Each image reports its NEAREST bucket-mate and
    // how many candidates its buckets produced (the per-item-bounded
    // output q_semdedup uses; a pair list thresholded at the banding's
    // completeness bound of hamming<=3 is one filter away). At 100 TB
    // the signature frame is one small row per image and candidates
    // come only from shared 15-bit buckets — never an all-pairs
    // product; a real decoder swaps in under the same hash.
    "q_multimodal_phash" -> ((s, d) => {
      // REPRESENTATIVE-COLLAPSED candidate generation (r13 scale-probe
      // finding: the former per-IMAGE band self-join grew 44.5× in wall
      // time for 10× data at the 100× probe — the synthetic corpus has
      // only ~15k distinct hashes among 500k images, so identical-hash
      // groups and shared band buckets made candidate PAIRS quadratic,
      // ~500M at 100×). Exact-duplicate collapse first: ONE row per
      // DISTINCT hash carries its image count and two smallest doc ids
      // (bounded graft_top_k, O(2) state); the band self-join then runs
      // over distinct HASHES only, and per-image results reconstruct
      // algebraically — for image ia with hash h,
      //   n_cands = (cnt(h) − 1) + Σ_{h' band-mates of h} cnt(h'),
      //   hamming = 0 when a same-hash mate exists (cnt ≥ 2), else the
      //             rep-level min hamming,
      //   nearest = the same-hash mate m1 (or m2 when ia IS m1), else
      //             the rep-level packed argmin's m1(h').
      // Identical results, bit-for-bit, to the pairwise formulation the
      // DuckDB oracle replays — verified by the unchanged oracle row.
      graft.ops.GraftAggregates.register(s)
      val sigs = phashDF(s, d).select(col("doc_id"), col("phash"))
      val reps = sigs.groupBy("phash").agg(
        count(lit(1)).as("cnt"),
        expr("graft_top_k(doc_id, 2)").as("mins"))
      val rbands = reps.select(col("phash"), col("cnt"),
          element_at(col("mins"), 1).as("m1"),
          explode(array((0 until 4).map(lit): _*)).as("band"))
        .withColumn("bsig",
          expr(s"(phash >> (band * $PhBandBits)) & ${(1 << PhBandBits) - 1}"))
      // Size-gated join strategy (r17, was un-hinted): past the
      // big-corpus gate the hint forces a hash build — at scale the
      // stats-planned fallback is SMJ, which would sort the band frames
      // for a bucket equi-join needing no ordering. Under the gate the
      // planner keeps its choice (broadcast when stats permit; the
      // sf0.1 SMJ over ~15k distinct-hash rows costs microseconds).
      val rcand = rbands.select(col("phash").as("ha"), col("band"), col("bsig"))
        .join(graft.queries.DedupQueries.hb(
          rbands.select(col("phash").as("hb"), col("cnt").as("cntb"),
            col("m1").as("m1b"), col("band"), col("bsig")),
          graft.queries.DedupQueries.bigCorpus(s, d)), Seq("band", "bsig"))
        .filter(col("ha") =!= col("hb"))
        .select(col("ha"), col("hb"), col("cntb"), col("m1b"),
          expr("CAST(bit_count(ha ^ hb) AS INT)").as("hamming"))
      // One explicit exchange on ha serves both aggregates (pair dedup
      // groups by (ha, hb) ⊇ ha; the rollup groups by ha) — same
      // shared-exchange shape as before, now at rep granularity. The
      // (hamming, m1) argmin packs into one BIGINT (hamming ≤ 64 high,
      // doc_id < 2^40 low) to stay hash-aggregable.
      val ragg = rcand.repartition(col("ha"))
        .groupBy("ha", "hb").agg(min(col("hamming")).as("hamming"),
          min(col("cntb")).as("cntb"), min(col("m1b")).as("m1b"))
        .groupBy("ha")
        .agg(sum(col("cntb")).as("nc_other"),
          min(expr("CAST(hamming AS BIGINT) * 1099511627776 + m1b")).as("bestp"))
        .withColumnRenamed("ha", "phash")
      // per-image expansion: both joins are phash-equi over frames
      // already clustered on phash, then one output sort
      sigs.join(reps, Seq("phash"))
        .join(ragg, Seq("phash"), "left")
        .select(col("doc_id"),
          when(col("cnt") >= 2,
            when(col("doc_id") === element_at(col("mins"), 1),
              element_at(col("mins"), 2))
              .otherwise(element_at(col("mins"), 1)))
            .otherwise(expr("bestp % 1099511627776")).as("nearest"),
          when(col("cnt") >= 2, lit(0))
            .otherwise(expr("CAST(bestp DIV 1099511627776 AS INT)")).as("hamming"),
          (col("cnt") - 1 + coalesce(col("nc_other"), lit(0L))).as("n_cands"))
        .filter(col("n_cands") > 0)
        .orderBy("doc_id")
    }),

    // Incremental media ingest: the newly-arrived image batch (every
    // IncrMod-th doc) probed against the existing corpus signature
    // index through the same band buckets — the continuous-ingest
    // shape the text SimHash / LSH / IVF families already follow, on
    // the media tier. Every batch image gets a row: a clean image
    // reads as n_cands = 0 instead of vanishing. At 100 TB the corpus
    // side is a band-partitioned pre-built index; the batch joins
    // bucket-to-bucket, never batch x corpus.
    "q_multimodal_phash_incremental" -> ((s, d) => {
      val sig = phashDF(s, d)
      val bands = sig.select(col("doc_id"), col("phash"),
          explode(array((0 until 4).map(lit): _*)).as("band"))
        .withColumn("bsig",
          expr(s"(phash >> (band * $PhBandBits)) & ${(1 << PhBandBits) - 1}"))
      // no join hint — same stats-based auto-adaptation note as
      // q_multimodal_phash
      val cand = bands.filter(col("doc_id") % DedupQueries.IncrMod === 0)
        .select(col("doc_id").as("ia"), col("phash").as("ha"),
          col("band"), col("bsig"))
        .join(bands.filter(col("doc_id") % DedupQueries.IncrMod =!= 0)
          .select(col("doc_id").as("ib"), col("phash").as("hb"),
            col("band"), col("bsig")),
          Seq("band", "bsig"))
        .select(col("ia"), col("ib"),
          expr("CAST(bit_count(ha ^ hb) AS INT)").as("hamming"))
      // same one-exchange dedup + packed hash-aggregable argmin as
      // q_multimodal_phash
      val agg = cand.repartition(col("ia"))
        .groupBy("ia", "ib").agg(min(col("hamming")).as("hamming"))
        .groupBy("ia")
        .agg(count(lit(1)).as("n_cands"),
          min(expr("CAST(hamming AS BIGINT) * 1099511627776 + ib")).as("bestp"))
      // the keep-clean-images join: both sides are BATCH-keyed (one row
      // per ingested image), and an ingest batch is operationally sized
      // — broadcast the aggregated side instead of paying a sort-merge
      // exchange pair on ia
      sig.filter(col("doc_id") % DedupQueries.IncrMod === 0)
        .select(col("doc_id").as("ia"))
        .join(broadcast(agg), Seq("ia"), "left")
        .select(col("ia").as("doc_id"),
          coalesce(col("n_cands"), lit(0L)).as("n_cands"),
          expr("bestp % 1099511627776").as("nearest"),
          expr("CAST(bestp DIV 1099511627776 AS INT)").as("hamming"))
        .orderBy("doc_id")
    }),

    // Tumbling event-time window aggregate (watermarked on streams).
    "q_stream_window" -> ((s, d) => {
      EventStreams.windowedAgg(Tables.load(s, d, "events"))
        .orderBy("window_start_us", "event_type")
    }),

    // Gap-based sessionization via flatMapGroupsWithState.
    "q_stream_sessionize" -> ((s, d) => {
      EventStreams.sessionize(s, Tables.load(s, d, "events"))
        .toDF()
        .orderBy("user_id", "start_us")
    }),

    // The SAME sessions through the (user, time-chunk) pre-key batch
    // path (r15; simplified r16) — the parallel escape hatch for hot
    // user keys: the typed operator above funnels a user's entire
    // history through one state group, which the stream-skew wave
    // showed serializing 20% of the corpus on one core; this plan
    // reduces the per-event work to ONE hash aggregate onto (user,
    // chunk) summaries (chunk width == gap ⇒ one session per nonempty
    // chunk) and stitches sessions over the summaries. Output-identical
    // by construction (ChunkedSessionizeSpec incl. pre-epoch chunks)
    // and against the same gaps-and-islands oracle.
    "q_stream_sessionize_chunked" -> ((s, d) => {
      EventStreams.sessionizeChunked(Tables.load(s, d, "events"))
        .orderBy("user_id", "start_us")
    }),

    // The strategy SELECTOR over the two rows above (r17, verdict r16
    // item 3): one bounded skew diagnostic (largest single user's row
    // count — the q_skew_audit top hitter) decides typed vs chunked at
    // the crossover the stream-skew wave measured. At gate scale the
    // corpus is far below the crossover, so this row exercises the
    // diagnostic + the typed branch end-to-end; StrategySelectorSpec
    // pins the chunked branch (both are output-identical, so the shared
    // gaps-and-islands oracle is exact for every choice).
    "q_stream_sessionize_auto" -> ((s, d) => {
      EventStreams.sessionizeAuto(s, Tables.load(s, d, "events"))
        .orderBy("user_id", "start_us")
    }),

    // Streaming first-seen dedup run in batch mode (VERDICT r4 item 4):
    // the SAME withWatermark + dropDuplicatesWithinWatermark operator the
    // stream uses, with arrival order pinned to event-time order so the
    // surviving row is deterministic (first event per (user, event_type)
    // — first-touch attribution). The oracle replays it as a windowed
    // ROW_NUMBER pick.
    "q_stream_dedup" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      EventStreams.dedupFirstSeenBatchOrdered(
          ev, md5(concat_ws("|", col("user_id"), col("event_type"))),
          Seq("ts", "event_id"),
          watermark = Some(("ts", "30 minutes")))
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("value").cast("double").as("value"))
        .orderBy("user_id", "event_type")
    }),

    // The SAME first-seen keepers as ONE aggregate (r16 — the dedup
    // analogue of the chunked strategy rows, closing the last
    // documented-only hot-key residual): the ordered replay above
    // repartitions a hot fingerprint whole into one task's sort;
    // min_by(row, (ts, event_id)) partially aggregates below the
    // exchange, so the hot key combines per input partition — no
    // single-key chain anywhere. Exact because (ts, event_id) is
    // unique per key (the same condition the ordered replay's
    // determinism rests on); shares q_stream_dedup's oracle.
    "q_stream_dedup_agg" -> ((s, d) => {
      // project BEFORE the aggregate: the keeper struct packs every
      // input column, so Catalyst cannot prune the scan through it —
      // unlike the ordered replay, where pruning pushes past the dedup
      val ev = Tables.load(s, d, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      EventStreams.dedupFirstSeenAgg(
          ev, md5(concat_ws("|", col("user_id"), col("event_type"))),
          Seq("ts", "event_id"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("value").cast("double").as("value"))
        .orderBy("user_id", "event_type")
    }),

    // Stream-static dimension enrichment run in batch mode: the SAME
    // broadcast-join operator a stream uses per micro-batch (stateless,
    // stream never shuffled — EventStreams.enrichStatic; StreamingSpec
    // drives it over a real MemoryStream). Events enrich with customer
    // segment + nation, then aggregate on the exact cents grid.
    "q_stream_enrich" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      val cust = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
      val nat = Tables.load(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"))
      EventStreams.enrichStatic(ev, cust, "user_id", "c_custkey")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"), "left")
        .groupBy("n_name", "c_mktsegment", "event_type")
        .agg(count(lit(1)).as("n"),
          expr("CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)")
            .as("value_cents"))
        .orderBy("n_name", "c_mktsegment", "event_type")
    }),

    // Stream-stream interval join run in batch mode: the SAME
    // double-watermark + bounded-time-condition operator the stream uses
    // (state-expirable by construction), attributing purchases to the
    // user's views in the prior 30 minutes.
    "q_stream_join" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      EventStreams.attributionJoin(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"))
        .orderBy("purchase_id", "view_id")
    }),

    // As-of join: each purchase matched to the user's latest prior signup
    // (union + ordered-window carry; DuckDB's native ASOF JOIN is the
    // oracle).
    "q_asof_join" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.ops.AsOfJoin.leftAsOf(purchases, signups,
          key = "user_id", time = "ts", tie = "event_id",
          carry = Map("event_id" -> "signup_id", "ts" -> "signup_ts"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("signup_id"),
          unix_micros(col("signup_ts")).as("signup_ts_us"))
        .orderBy("event_id")
    }),

    // The SAME as-of join through the (key, time-chunk) pre-key (r16 —
    // the q_asof_join analogue of q_stream_sessionize_chunked, closing
    // the SCALE.md documented-only residual): the plain operator's
    // per-key ordered carry serializes a hot key's merged stream in one
    // window task; this plan runs the carry per (user, chunk) and
    // stitches with one last-non-null pass over chunk SUMMARIES.
    // Output-identical by construction (ChunkedAsofSpec) and against
    // q_asof_join's native DuckDB ASOF JOIN oracle.
    "q_asof_join_chunked" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.ops.AsOfJoin.leftAsOfChunked(purchases, signups,
          key = "user_id", time = "ts", tie = "event_id",
          carry = Map("event_id" -> "signup_id", "ts" -> "signup_ts"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("signup_id"),
          unix_micros(col("signup_ts")).as("signup_ts_us"))
        .orderBy("event_id")
    }),

    // Range join (no equi-key): for each purchase, count error events in
    // the preceding 10 minutes across ALL users — bucketed time-grid
    // equi-join + exact filter (never a nested-loop/cartesian plan);
    // DuckDB's inequality join is the oracle.
    "q_range_join" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("ts"))
      val pairs = graft.ops.RangeJoin.rangeJoin(
        purchases, errors, "ts", "ts", -600000000L, 0L)
      purchases
        .join(pairs.groupBy("event_id").agg(count(lit(1)).as("n_errors")),
          Seq("event_id"), "left")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          coalesce(col("n_errors"), lit(0L)).as("n_errors"))
        .orderBy("event_id")
    }),

    // Sequence packing: assign documents (in doc_id order) to fixed
    // 2048-token training windows — a document belongs to the window its
    // first token lands in, i.e. bin = floor(prefix_sum_before / budget).
    // The prefix sum is the distributed two-pass form (range partition +
    // per-partition windows + broadcast offsets, graft.ops.PrefixSum),
    // NOT a single-partition global window; the oracle replays it with a
    // plain windowed running sum.
    "q_pack_sequences" -> ((s, d) => {
      val toks = Tables.load(s, d, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).as("ntok"))
      graft.ops.PrefixSum.runningBefore(toks, "doc_id", "ntok")
        .select(col("doc_id"), col("ntok"),
          expr("CAST(floor(cum_before / 2048.0) AS BIGINT)").as("bin"))
        .orderBy("doc_id")
    }),

    // Skewed aggregation through the explicit two-phase salted shape
    // (graft.ops.Skew): event_type has only 5 distinct values over the
    // whole events table — the exact case where a plain groupBy funnels
    // each hot key into one task. Salting splits each key into 32
    // sub-groups aggregated in parallel; the merge phase aggregates 160
    // tiny partials. Decimal sums keep the result order-independent, so
    // the oracle is the plain GROUP BY.
    "q_salted_agg" -> ((s, d) => {
      graft.ops.Skew.saltedCountSum(
          Tables.load(s, d, "events").select(col("event_type"), col("value")),
          "event_type", col("value").cast(DecimalType(18, 4)), saltBuckets = 32)
        .select(col("event_type"), col("n"),
          col("total").cast(DoubleType).as("total"))
        .orderBy("event_type")
    }),

    // GPU-batch planning over the binary payload tier: assign each
    // payload to a fixed-byte-budget inference batch via the distributed
    // prefix sum (range partition + broadcast offsets — NOT a global
    // single-partition window), then emit the per-batch manifest. The
    // same shape as sequence packing, applied to bytes: at 100 TB this
    // is how a multimodal scoring pass sizes its accelerator batches
    // without any driver-side loop.
    "q_multimodal_batchplan" -> ((s, d) => {
      val sz = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          expr("octet_length(encode(text, 'UTF-8'))").as("n_bytes"))
      graft.ops.PrefixSum.runningBefore(sz, "doc_id", "n_bytes")
        .select(col("doc_id"), col("n_bytes"),
          expr("CAST(floor(cum_before / 65536.0) AS BIGINT)").as("batch_id"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n_items"), sum("n_bytes").as("total_bytes"),
          min("doc_id").as("first_doc"))
        .orderBy("batch_id")
    }),

    // Sliding-window chunking: split each document into max-32-token
    // chunks with 8 tokens of overlap (stride 24) — the pre-tokenization
    // step that turns long documents into training sequences. Chunk
    // count and bounds are closed-form per document, so the whole
    // operator is one narrow explode with NO shuffle (ordering aside);
    // chunk provenance (doc_id, chunk_id, start_tok) and an md5 of the
    // chunk text make every chunk re-joinable to its source.
    "q_chunk_text" -> ((s, d) => {
      // Delegates to the Curation API (same closed-form plan, shared
      // constants with the oracle below).
      graft.ops.Curation.chunkText(Tables.load(s, d, "documents"),
          "doc_id", "text", maxTokens = ChunkMax, overlap = ChunkOverlap)
        .orderBy("doc_id", "chunk_id")
    }),

    // End-to-end training-data prep — the operators composed as a real
    // job: quality-score filter → exact dedup (canonical keeper = min
    // doc_id per fingerprint) → sequence packing of the survivors into
    // 2048-token windows via the distributed prefix sum. Every stage is
    // the same deterministic arithmetic as its standalone query, so the
    // whole pipeline is oracle-exact.
    "q_pipeline_prep" -> ((s, d) => {
      val quality =
        """0.5 * (CAST(size(array_distinct(split(lower(text), ' '))) AS DOUBLE) / size(split(text, ' ')))
          | + 0.25 * (CASE WHEN size(split(text, ' ')) BETWEEN 20 AND 120 THEN 1.0 ELSE 0.0 END)
          | + 0.25 * (CAST(size(filter(split(lower(text), ' '), x -> array_contains(array('the', 'a'), x))) AS DOUBLE) / size(split(text, ' ')))""".stripMargin.replace("\n", " ")
      val kept = Tables.load(s, d, "documents")
        .selectExpr("doc_id", "text", s"($quality) AS quality")
        .filter(col("quality") >= 0.5)
        .withColumn("fp", md5(concat_ws(" ", array_sort(split(lower(col("text")), " ")))))
      val keepers = kept.groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
      val toks = kept.join(keepers, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), size(split(col("text"), " ")).as("ntok"))
      graft.ops.PrefixSum.runningBefore(toks, "doc_id", "ntok")
        .select(col("doc_id"), col("ntok"),
          expr("CAST(floor(cum_before / 2048.0) AS BIGINT)").as("bin"))
        .orderBy("doc_id")
    }),

    // Count-Min Sketch word-frequency estimates: a fixed d x w cell
    // table (4 x 256 = 1024 cells REGARDLESS of corpus size — that fixed
    // bound is the whole point at 100 TB), built with one hash
    // aggregate; probe estimates are the min over rows of the probed
    // cell. Deterministic portable hashing makes the ESTIMATE itself
    // oracle-exact, and the true counts ride along so the
    // over-estimation guarantee (est >= true, and = for non-colliding
    // words) is visible in the verified output.
    "q_sketch_cms" -> ((s, d) => {
      // The CmsD row-buckets are DISJOINT BYTES of the word's 60-bit
      // md5-prefix hash — which the shared word frame ALREADY carries as
      // column `h`, so building the sketch does zero hashing: pure
      // shift/mask integer ops over a persisted frame (bytes of a
      // cryptographic digest are independent enough for CMS).
      val buckets = (0 until CmsD).map(r => expr(s"(h >> ${8 * r}) & 255"))
      val words = DedupQueries.wordDF(s, d).select("word", "h")
      val cells = words
        .select(posexplode(array(buckets: _*)).as(Seq("r", "b")))
        .groupBy("r", "b").agg(count(lit(1)).as("n"))
      val probes = s.range(1)
        .select(explode(array(CmsProbes.map(lit): _*)).as("word"))
        .withColumn("h", expr(
          "CAST(conv(substr(md5(word), 1, 15), 16, 10) AS BIGINT)"))
        .select(col("word"), posexplode(array(buckets: _*)).as(Seq("r", "b")))
      // broadcast the CELLS (1024 rows, fixed size): a LeftOuter
      // BroadcastHashJoin can only build its right side.
      val est = probes.join(broadcast(cells), Seq("r", "b"), "left")
        .groupBy("word").agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
      val tru = words.filter(col("word").isin(CmsProbes: _*))
        .groupBy("word").agg(count(lit(1)).as("n_true"))
      est.join(tru, Seq("word"), "left")
        .select(col("word"), col("cms_est"),
          coalesce(col("n_true"), lit(0L)).as("n_true"))
        .orderBy("word")
    }),

    // HyperLogLog distinct-count sketch per event_type: 64 registers
    // carved from the portable 60-bit hash (bucket = low 6 bits, rank =
    // leading-zero count of the remaining 54). The register table is a
    // hash aggregate of FIXED size (m rows per group at ANY corpus
    // size — the entire point at 100 TB: distinct-count state that
    // never grows), and the harmonic sum is EXACT integer arithmetic:
    // SUM(2^(55-rank)) is a BIGINT (<= 64 * 2^54 < 2^63), so the only
    // float op is the final one-expression estimate, identical in both
    // engines. Exact distinct counts ride along to expose the error.
    "q_sketch_hll" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("event_type"), col("user_id"),
          expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
      val regs = ev
        .select(col("event_type"), (col("h") % HllM).as("b"),
          expr("CASE WHEN shiftright(h, 6) = 0 THEN 55 ELSE 55 - length(bin(shiftright(h, 6))) END").as("rho"))
        .groupBy("event_type", "b").agg(max("rho").as("rz"))
      val sums = regs.groupBy("event_type")
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - rz)")).as("s_present"),
          count(lit(1)).as("nb"))
        .select(col("event_type"),
          expr(s"s_present + ($HllM - nb) * shiftleft(CAST(1 AS BIGINT), 55)").as("s_all"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct("user_id").as("n_exact"))
      exact.join(sums, Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          expr(s"CAST($HllAlpha AS DOUBLE) * CAST(${HllM * HllM} AS DOUBLE) * " +
            s"CAST(${1L << 55} AS DOUBLE) / CAST(s_all AS DOUBLE)").as("hll_est"))
        .orderBy("event_type")
    }),

    // Histogram quantiles: p50/p90/p99 of l_extendedprice per return
    // flag via a fixed-width bucket histogram — ONE scan + a hash
    // aggregate whose size is the bucket count, then a window over the
    // HISTOGRAM (thousands of rows), never a sort of the data. This is
    // the distributed-quantile shape at 100 TB: exact-to-the-bucket,
    // integer cum*100 >= pct*total arithmetic, no approx_percentile
    // nondeterminism. The selected bucket's lower bound is the answer.
    "q_quantile_hist" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hist = Tables.load(s, d, "lineitem")
        .select(col("l_returnflag"),
          expr(s"CAST(floor(CAST(l_extendedprice AS DOUBLE) / $QuantBucket) AS BIGINT)").as("bucket"))
        .groupBy("l_returnflag", "bucket").agg(count(lit(1)).as("n"))
      val cum = hist
        .withColumn("cum",
          sum("n").over(Window.partitionBy("l_returnflag").orderBy("bucket")))
        .withColumn("tot",
          sum("n").over(Window.partitionBy("l_returnflag")))
      val qs = s.range(1)
        .select(explode(array(QuantPcts.map(lit): _*)).as("q_pct"))
      cum.crossJoin(broadcast(qs))
        .filter(col("cum") * 100 >= col("q_pct") * col("tot"))
        .groupBy("l_returnflag", "q_pct")
        .agg(min("bucket").as("bucket"))
        .select(col("l_returnflag"), col("q_pct"), col("bucket"),
          (col("bucket") * QuantBucket).as("value_lo"))
        .orderBy("l_returnflag", "q_pct")
    }),

    // KMV distinct-count sketch per event_type: deterministic with the
    // portable 60-bit hash, so the estimate is exactly reproducible in
    // SQL (the oracle recomputes the kth-order statistic).
    "q_sketch_kmv" -> ((s, d) => {
      graft.ops.GraftAggregates.register(s)
      Tables.load(s, d, "events")
        .select(col("event_type"),
          expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
        .groupBy("event_type")
        .agg(expr("graft_kmv(h, 32)").as("est_users"))
        .orderBy("event_type")
    }),

    // Z-order (Morton) data layout: interleave the bits of two query
    // dimensions (user bucket x, hour bucket y) into one sort key, then
    // audit per-range-bucket min/max spans. At 100 TB the z-key is the
    // `repartitionByRange` + sortWithinPartitions key at write time, so
    // every file's min/max footer covers a NARROW range of BOTH
    // dimensions and scans filtering on either prune files — the
    // multi-dimensional clustering trick behind lakehouse OPTIMIZE
    // ZORDER. Here the layout audit itself is the query: one scan, one
    // hash aggregate (bucket count is fixed), exact integer bit math.
    "q_zorder_layout" -> ((s, d) => {
      Tables.load(s, d, "events")
        .select(expr(s"user_id % ${1 << ZBits}").as("xb"),
          expr(s"(unix_micros(ts) div 3600000000) % ${1 << ZBits}").as("yb"))
        .withColumn("zval", expr(zSpark("xb", "yb")))
        .withColumn("zbucket", expr(s"zval div $ZBucketDiv"))
        .groupBy("zbucket")
        .agg(count(lit(1)).as("n"),
          min("xb").as("min_x"), max("xb").as("max_x"),
          min("yb").as("min_y"), max("yb").as("max_y"))
        .withColumn("span_x", col("max_x") - col("min_x"))
        .withColumn("span_y", col("max_y") - col("min_y"))
        .orderBy("zbucket")
    }),

    // Bucketed co-located join — the data-layout answer to the shuffle
    // problem: orders and customer are written ONCE as bucketed tables
    // (BucketN buckets on the join key, sorted within buckets); reading
    // them back, Catalyst proves both sides' output partitioning already
    // satisfies the join's distribution requirement, so the
    // SortMergeJoin plans with ZERO Exchange. At 100 TB that is the
    // difference between re-shuffling the fact table on every join and
    // never shuffling it again — the layout cost is paid once at write
    // time and amortized over every subsequent join on that key.
    // ScaleTechniquesSpec pins the exchange-free plan; the oracle
    // replays the same join declaratively over the raw parquet.
    "q_bucket_join" -> ((s, d) => {
      val (ot, ct) = bucketTables(s, d)
      s.table(ot).join(s.table(ct), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // CDC upsert/delete merge (the MERGE INTO shape): reduce the change
    // stream to its last event per key (shuffle by key, then a bounded
    // window over per-key groups), then one full-outer join against the
    // base table applies keeps/updates/inserts and drops deletes. At
    // 100 TB both sides shuffle-partition on the merge key (no
    // broadcast: the base is the big side and full-outer needs both),
    // AQE handles hot keys; the change reduction is the classic
    // "compact the CDC log before merging" step.
    "q_cdc_merge" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val last = Tables.load(s, d, "events")
        .withColumn("rn", row_number().over(Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("value"))
      val base = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      base.join(last, base("c_custkey") === last("user_id"), "full_outer")
        .filter(col("user_id").isNull || col("event_type") =!= "error")
        .select(coalesce(col("c_custkey"), col("user_id")).as("custkey"),
          col("c_name"),
          coalesce(col("value"), col("c_acctbal")).as("acctbal"),
          when(col("user_id").isNull, lit("keep"))
            .when(col("c_custkey").isNull, lit("insert"))
            .otherwise(lit("update")).as("op"))
        .orderBy("custkey")
    }),

    // Join-key skew audit — the diagnostic that DECIDES when to salt
    // (ops.Skew) or let AQE split: per-key counts (one hash aggregate),
    // then heavy hitters via the bounded `graft_top_k` aggregate and the
    // corpus totals as ONE more aggregate row — never a global sort, no
    // per-key state beyond k. Each hitter reports its absolute count,
    // corpus share in ppm, and x100-times-average concentration, all
    // exact integer arithmetic.
    "q_skew_audit" -> ((s, d) => {
      graft.ops.GraftAggregates.register(s)
      val counts = Tables.load(s, d, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      val audit = counts.agg(
        expr(s"graft_top_k(struct(-n AS s, user_id AS k, n AS n), $SkewTopK)").as("top"),
        count(lit(1)).as("n_keys"), sum("n").as("total"))
      audit.select(posexplode(col("top")).as(Seq("i", "hit")),
          col("n_keys"), col("total"))
        .select((col("i") + 1).as("rank"),
          col("hit.k").as("user_id"), col("hit.n").as("n"),
          expr("(hit.n * 1000000) DIV total").as("share_ppm"),
          expr("(hit.n * n_keys * 100) DIV total").as("x_avg_100"),
          col("n_keys"), col("total"))
        .orderBy("rank")
    }),

    // Paragraph-level corpus dedup (the CCNet move: dedup PARAGRAPHS
    // across the whole corpus, not documents — boilerplate headers and
    // copied passages vanish while the rest of the document survives).
    // Paragraph stand-in = the non-overlapping ChunkMax-token window;
    // keeper = first occurrence by (doc_id, chunk_id), found with ONE
    // fingerprint hash aggregate (no self-join, no window over the
    // corpus); per-doc kept ratios are the curation signal. All exact
    // integer/md5 arithmetic.
    "q_para_dedup" -> ((s, d) => {
      // The keeper's doc_id folds out of the packed key (ck = doc ·
      // ParaPack + chunk), so the corpus-sized chunk frame never joins
      // back: one fp aggregate + one doc aggregate, two exchanges
      // instead of three (the join-back shape re-shuffled the chunk
      // frame a second time). A doc whose every chunk lost to an
      // earlier doc has NO keeper row — the left join restores its 0.
      val chunks = paraChunksDF(s, d)
      val kept = chunks.groupBy("fp").agg(min("ck").as("mink"))
        .select(expr(s"mink DIV $ParaPack").as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("k"))
      chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("k"), lit(0L)).as("n_kept"))
        .withColumn("kept_ratio",
          expr("CAST(n_kept AS DOUBLE) / CAST(n_chunks AS DOUBLE)"))
        .orderBy("doc_id")
    }),

    // Theta-sketch set operations (DataSketches-style): estimate the
    // distinct-user UNION and INTERSECTION of two event populations from
    // one bounded sketch pass, next to the exact answers so the row
    // audits its own error. The scale shape is what matters at 100 TB:
    // each population's sketch is k hashes, θ (the union's k-th smallest
    // distinct hash) comes from a TakeOrderedAndProject top-k — local
    // top-k per partition, k rows to one reducer, never a global sort —
    // and the intersection estimate counts common hashes below θ, of
    // which there are at most k by construction. The only data-sized
    // work is one distinct + one hash aggregate; union/intersection of
    // N sketches later is k-row arithmetic, no re-scan (the reason theta
    // sketches, not exact counts, are the cross-partition currency).
    "q_theta_setops" -> ((s, d) => {
      val h = h60p("CAST(user_id AS STRING)")
      val byH = Tables.load(s, d, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"), expr(h).as("h"))
        .distinct()
        .groupBy("h")
        .agg(count(lit(1)).as("ntypes"),
          min("event_type").as("t_min"), max("event_type").as("t_max"))
      val theta = byH.select("h").orderBy("h").limit(ThetaK)
        .agg(max("h").as("kth"), count(lit(1)).as("n_seen"))
      byH.crossJoin(broadcast(theta))
        .agg(
          sum(when(col("t_min") === "click", 1L).otherwise(0L)).as("exact_a"),
          sum(when(col("t_max") === "purchase", 1L).otherwise(0L)).as("exact_b"),
          count(lit(1)).as("exact_union"),
          sum(when(col("ntypes") === 2, 1L).otherwise(0L)).as("exact_inter"),
          sum(when(col("ntypes") === 2 && col("h") < col("kth"), 1L)
            .otherwise(0L)).as("common_below"),
          max("kth").as("kth"), max("n_seen").as("n_seen"))
        .select(col("exact_a"), col("exact_b"), col("exact_union"),
          col("exact_inter"),
          expr(s"""CASE WHEN n_seen < $ThetaK THEN CAST(exact_union AS DOUBLE)
                   ELSE ${ThetaK - 1}.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE) END""")
            .as("est_union"),
          expr(s"""CASE WHEN n_seen < $ThetaK THEN CAST(exact_inter AS DOUBLE)
                   ELSE CAST(common_below AS DOUBLE) * 1152921504606846976.0
                        / CAST(kth AS DOUBLE) END""")
            .as("est_inter"))
    }),

    // Watermark-delay audit: per event type, how late do events arrive
    // behind the event-time high-water mark, and what is the max lag —
    // the number an operator SETS `withWatermark` / the dedup window to.
    // The synthetic feed is time-ordered, so arrival reordering is
    // SIMULATED with a deterministic hash jitter on the arrival key
    // (clearly a simulation knob, like the multimodal decode stub; a
    // real ingest would use the log offset). Shape (r16, verdict r15
    // item 4): the running high-water mark is SHARDED over contiguous
    // arrival-key ranges (EventStreams.arrivalHighWaterMark) — the
    // former single window partitioned by event_type alone capped
    // parallelism at the type count (5) at ANY scale; now it is
    // types × 64 shards with a broadcast-sized carry-in stitch, then
    // the same per-type hash agg. Oracle unchanged (exact algebra).
    "q_stream_late" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("event_type"), col("event_id"),
          expr("unix_micros(ts)").as("tsu"),
          expr(s"event_id + ${h60p("CAST(event_id AS STRING)")} % $LateJitter")
            .as("arrival_key"))
      EventStreams.arrivalHighWaterMark(ev, "tsu", "arrival_key", "event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum((col("tsu") < col("hwm")).cast("long")).as("n_late"),
          max(col("hwm") - col("tsu")).as("max_lag_us"))
        .withColumn("late_ppm", expr("(n_late * 1000000) DIV n_events"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_chunk_text" -> {
      val (max, stride) = (ChunkMax, ChunkMax - ChunkOverlap)
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w,
         |             len(string_split(lower(text), ' ')) AS n FROM documents),
         |c AS (SELECT doc_id, w, n,
         |        CASE WHEN n <= $max THEN 1
         |             ELSE 1 + CAST(ceil(CAST(n - $max AS DOUBLE) / $stride) AS INT) END AS nc
         |      FROM d),
         |e AS (SELECT doc_id, w, n, UNNEST(range(0, nc)) AS chunk_id FROM c)
         |SELECT doc_id, chunk_id,
         |  chunk_id * $stride + 1 AS start_tok,
         |  least($max, n - chunk_id * $stride) AS n_tok,
         |  md5(array_to_string(w[(chunk_id * $stride + 1):(chunk_id * $stride + least($max, n - chunk_id * $stride))], ' ')) AS fp
         |FROM e ORDER BY doc_id, chunk_id""".stripMargin
    },
    "q_pipeline_prep" ->
      """WITH s AS (
        |  SELECT doc_id, text,
        |    0.5 * (CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE) / len(string_split(text, ' ')))
        |     + 0.25 * (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 120 THEN 1.0 ELSE 0.0 END)
        |     + 0.25 * (CAST(len(list_filter(string_split(lower(text), ' '), x -> list_contains(['the', 'a'], x))) AS DOUBLE) / len(string_split(text, ' ')))
        |     AS quality
        |  FROM documents),
        |f AS (SELECT doc_id, text,
        |    md5(array_to_string(list_sort(string_split(lower(text), ' ')), ' ')) AS fp
        |  FROM s WHERE quality >= 0.5),
        |keep AS (SELECT MIN(doc_id) AS doc_id FROM f GROUP BY fp),
        |t AS (SELECT k.doc_id, len(string_split(f.text, ' ')) AS ntok
        |      FROM keep k JOIN f ON k.doc_id = f.doc_id)
        |SELECT doc_id, CAST(ntok AS INT) AS ntok,
        |  CAST(floor(COALESCE(SUM(ntok) OVER (
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    / 2048.0) AS BIGINT) AS bin
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS ntok FROM documents)
        |SELECT doc_id, CAST(ntok AS INT) AS ntok,
        |  CAST(floor(COALESCE(SUM(ntok) OVER (
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    / 2048.0) AS BIGINT) AS bin
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_multimodal_batchplan" ->
      """WITH t AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents),
        |c AS (
        |  SELECT doc_id, n_bytes,
        |    CAST(floor(COALESCE(SUM(n_bytes) OVER (
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      / 65536.0) AS BIGINT) AS batch_id
        |  FROM t)
        |SELECT batch_id, COUNT(*) AS n_items,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes, MIN(doc_id) AS first_doc
        |FROM c GROUP BY batch_id ORDER BY batch_id""".stripMargin,

    "q_multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(unicode(substr(text, 1, 1)) AS INT) AS first_byte,
        |  CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
        |  CAST(64 + (octet_length(encode(text)) * 31) % 433 AS INT) AS height,
        |  CASE CAST(octet_length(encode(text)) % 3 AS INT)
        |    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_resize" ->
      s"""WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
         |px AS (SELECT doc_id, nb,
         |    list_transform(range(0, $ResizeOut),
         |      j -> unicode(substr(text, CAST((j * nb) // $ResizeOut AS INT) + 1, 1))) AS pxs
         |  FROM d)
         |SELECT doc_id, CAST(nb AS INT) AS n_bytes,
         |  CAST($ResizeOut AS INT) AS out_len,
         |  CAST(list_aggregate(pxs, 'sum') AS INT) AS checksum,
         |  CAST(pxs[1] AS INT) AS first_px,
         |  CAST(pxs[$ResizeOut] AS INT) AS last_px
         |FROM px ORDER BY doc_id""".stripMargin,
    "q_multimodal_framesample" ->
      s"""WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
         |f AS (SELECT doc_id, text, nb,
         |        UNNEST(range(0, CAST(ceil(CAST(nb AS DOUBLE) / $FrameSize) AS INT))) AS frame_id
         |      FROM d)
         |SELECT doc_id, frame_id, frame_id * $FrameSize AS off,
         |  CAST(least($FrameSize, nb - frame_id * $FrameSize) AS INT) AS fr_bytes,
         |  CAST(list_aggregate(list_transform(
         |    range(frame_id * $FrameSize + 1, frame_id * $FrameSize + least($FrameSize, nb - frame_id * $FrameSize) + 1),
         |    j -> unicode(substr(text, CAST(j AS INT), 1))), 'sum') AS INT) AS checksum
         |FROM f WHERE frame_id % $FrameStride = 0
         |ORDER BY doc_id, frame_id""".stripMargin,
    // The oracle reproduces the same candidate set (bucket-mates) and
    // per-image nearest pick; the argmin is spelled as a two-step
    // (min hamming, then min ib at that hamming) — identical values to
    // the engine's lexicographic struct-min.
    "q_multimodal_phash" ->
      s"""WITH $phashOracleCte,
         |cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib,
         |    CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.bsig = b.bsig
         |    AND a.doc_id <> b.doc_id),
         |g AS (SELECT ia, COUNT(*) AS n_cands, MIN(hamming) AS best_h
         |  FROM cand GROUP BY ia),
         |best AS (SELECT c.ia, MIN(c.ib) AS nearest
         |  FROM cand c JOIN g ON c.ia = g.ia AND c.hamming = g.best_h
         |  GROUP BY c.ia)
         |SELECT g.ia AS doc_id, best.nearest, g.best_h AS hamming, g.n_cands
         |FROM g JOIN best ON g.ia = best.ia
         |ORDER BY doc_id""".stripMargin,

    // Ingest probe: every batch image gets a row (LEFT join), so a
    // clean batch reads as n_cands = 0 rather than vanishing.
    "q_multimodal_phash_incremental" ->
      s"""WITH $phashOracleCte,
         |cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib,
         |    CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.bsig = b.bsig
         |   AND a.doc_id % ${DedupQueries.IncrMod} = 0
         |   AND b.doc_id % ${DedupQueries.IncrMod} <> 0),
         |g AS (SELECT ia, COUNT(*) AS n_cands, MIN(hamming) AS best_h
         |  FROM cand GROUP BY ia),
         |best AS (SELECT c.ia, MIN(c.ib) AS nearest
         |  FROM cand c JOIN g ON c.ia = g.ia AND c.hamming = g.best_h
         |  GROUP BY c.ia)
         |SELECT sig.doc_id, COALESCE(g.n_cands, 0) AS n_cands,
         |  best.nearest, g.best_h AS hamming
         |FROM sig LEFT JOIN g ON sig.doc_id = g.ia
         |  LEFT JOIN best ON sig.doc_id = best.ia
         |WHERE sig.doc_id % ${DedupQueries.IncrMod} = 0
         |ORDER BY doc_id""".stripMargin,

    "q_stream_window" ->
      """SELECT epoch_us(time_bucket(INTERVAL 10 MINUTE, ts)) AS window_start_us,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stream_dedup" ->
      """WITH r AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DOUBLE) AS value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id, ts_us, value FROM r WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    // deliberately byte-identical to q_stream_dedup's: the aggregate
    // plan is an execution STRATEGY and must reproduce the same keepers
    "q_stream_dedup_agg" ->
      """WITH r AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DOUBLE) AS value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id, ts_us, value FROM r WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "q_stream_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |m AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM o),
        |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
        |  COUNT(*) AS n_events, CAST(SUM(v) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,
    // identical sessions, different execution strategy — the chunked
    // plan must reproduce the canonical gaps-and-islands result
    "q_stream_sessionize_chunked" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |m AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM o),
        |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
        |  COUNT(*) AS n_events, CAST(SUM(v) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,
    // the selector row: whichever branch the skew diagnostic picks must
    // reproduce the same canonical gaps-and-islands result
    "q_stream_sessionize_auto" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |m AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM o),
        |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
        |  COUNT(*) AS n_events, CAST(SUM(v) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,
    "q_stream_enrich" ->
      """SELECT n.n_name, c.c_mktsegment, e.event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events e
        |LEFT JOIN customer c ON e.user_id = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_stream_join" ->
      """SELECT p.event_id AS purchase_id, v.event_id AS view_id,
        |  p.user_id AS user_id,
        |  epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON v.user_id = p.user_id
        | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
        |ORDER BY purchase_id, view_id""".stripMargin,
    "q_asof_join" ->
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  l.event_id AS signup_id, epoch_us(l.ts) AS signup_ts_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') l
        |  ON e.user_id = l.user_id AND e.ts >= l.ts
        |ORDER BY e.event_id""".stripMargin,
    // deliberately byte-identical to q_asof_join's: the chunked plan is
    // an execution STRATEGY and must reproduce the canonical result
    "q_asof_join_chunked" ->
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  l.event_id AS signup_id, epoch_us(l.ts) AS signup_ts_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') l
        |  ON e.user_id = l.user_id AND e.ts >= l.ts
        |ORDER BY e.event_id""".stripMargin,
    "q_range_join" ->
      """WITH p AS (SELECT event_id, ts FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT event_id, ts FROM events WHERE event_type = 'error'),
        |c AS (
        |  SELECT p.event_id, COUNT(e.event_id) AS n_errors
        |  FROM p LEFT JOIN e
        |    ON e.ts >= p.ts - INTERVAL 10 MINUTE AND e.ts < p.ts
        |  GROUP BY p.event_id)
        |SELECT p.event_id, epoch_us(p.ts) AS ts_us, c.n_errors
        |FROM p JOIN c ON p.event_id = c.event_id
        |ORDER BY p.event_id""".stripMargin,
    "q_sketch_cms" -> {
      val probes = CmsProbes.map(p => s"'$p'").mkString("[", ", ", "]")
      val inList = CmsProbes.map(p => s"'$p'").mkString(", ")
      // Bucket r = byte r of the 60-bit md5-prefix hash (same value the
      // Spark plan reads from the shared word frame's `h` column).
      val duckBuckets = (0 until CmsD).map(r =>
        s"(h >> ${8 * r}) & 255").mkString("[", ", ", "]")
      s"""WITH w0 AS (SELECT UNNEST(string_split(lower(text), ' ')) AS word
         |            FROM documents),
         |w AS (SELECT word,
         |        CAST('0x' || substr(md5(word), 1, 15) AS BIGINT) AS h
         |      FROM w0),
         |rws AS (SELECT UNNEST(range(0, $CmsD)) AS r),
         |cells AS (
         |  SELECT r, ($duckBuckets)[CAST(r + 1 AS INT)] AS b, COUNT(*) AS n
         |  FROM w CROSS JOIN rws GROUP BY 1, 2),
         |pb AS (
         |  SELECT word, r, ($duckBuckets)[CAST(r + 1 AS INT)] AS b
         |  FROM (SELECT word,
         |          CAST('0x' || substr(md5(word), 1, 15) AS BIGINT) AS h
         |        FROM (SELECT UNNEST($probes) AS word)) CROSS JOIN rws),
         |est AS (
         |  SELECT word, MIN(COALESCE(n, 0)) AS cms_est
         |  FROM pb LEFT JOIN cells USING (r, b) GROUP BY word),
         |tru AS (SELECT word, COUNT(*) AS n_true FROM w
         |        WHERE word IN ($inList) GROUP BY word)
         |SELECT est.word AS word, CAST(cms_est AS BIGINT) AS cms_est,
         |       CAST(COALESCE(n_true, 0) AS BIGINT) AS n_true
         |FROM est LEFT JOIN tru USING (word) ORDER BY word""".stripMargin
    },

    "q_sketch_hll" ->
      s"""WITH e AS (SELECT event_type, user_id,
         |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
         |  FROM events),
         |r AS (SELECT event_type, h % $HllM AS b,
         |    CASE WHEN (h >> 6) = 0 THEN 55 ELSE 55 - length(bin(h >> 6)) END AS rho
         |  FROM e),
         |regs AS (SELECT event_type, b, MAX(rho) AS rz FROM r GROUP BY 1, 2),
         |sums AS (SELECT event_type,
         |    CAST(SUM(1::BIGINT << (55 - rz)) AS BIGINT)
         |      + ($HllM - COUNT(*)) * (1::BIGINT << 55) AS s_all
         |  FROM regs GROUP BY event_type),
         |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
         |       FROM events GROUP BY event_type)
         |SELECT event_type, n_exact,
         |  CAST($HllAlpha AS DOUBLE) * CAST(${HllM * HllM} AS DOUBLE)
         |    * CAST(${1L << 55} AS DOUBLE) / CAST(s_all AS DOUBLE) AS hll_est
         |FROM ex JOIN sums USING (event_type) ORDER BY event_type""".stripMargin,

    "q_quantile_hist" -> {
      val pcts = QuantPcts.mkString("[", ", ", "]")
      s"""WITH hist AS (
         |  SELECT l_returnflag,
         |    CAST(floor(CAST(l_extendedprice AS DOUBLE) / $QuantBucket) AS BIGINT) AS bucket,
         |    COUNT(*) AS n
         |  FROM lineitem GROUP BY 1, 2),
         |c AS (SELECT l_returnflag, bucket,
         |    SUM(n) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum,
         |    SUM(n) OVER (PARTITION BY l_returnflag) AS tot
         |  FROM hist),
         |q AS (SELECT UNNEST($pcts) AS q_pct)
         |SELECT l_returnflag, q_pct, MIN(bucket) AS bucket,
         |  MIN(bucket) * $QuantBucket AS value_lo
         |FROM c CROSS JOIN q WHERE cum * 100 >= q_pct * tot
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "q_theta_setops" ->
      s"""WITH e AS (
         |  SELECT DISTINCT event_type,
         |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
         |  FROM events WHERE event_type IN ('click', 'purchase')),
         |u AS (SELECT h, COUNT(*) AS ntypes, MIN(event_type) AS t_min,
         |        MAX(event_type) AS t_max
         |      FROM e GROUP BY h),
         |t AS (SELECT MAX(h) AS kth, COUNT(*) AS n_seen
         |      FROM (SELECT h FROM u ORDER BY h LIMIT $ThetaK)),
         |m AS (SELECT
         |        CAST(SUM(CASE WHEN t_min = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS exact_a,
         |        CAST(SUM(CASE WHEN t_max = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS exact_b,
         |        COUNT(*) AS exact_union,
         |        CAST(SUM(CASE WHEN ntypes = 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter,
         |        CAST(SUM(CASE WHEN ntypes = 2 AND h < kth THEN 1 ELSE 0 END) AS BIGINT)
         |          AS common_below,
         |        MAX(kth) AS kth, MAX(n_seen) AS n_seen
         |      FROM u CROSS JOIN t)
         |SELECT exact_a, exact_b, exact_union, exact_inter,
         |  CASE WHEN n_seen < $ThetaK THEN CAST(exact_union AS DOUBLE)
         |       ELSE ${ThetaK - 1}.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE) END
         |    AS est_union,
         |  CASE WHEN n_seen < $ThetaK THEN CAST(exact_inter AS DOUBLE)
         |       ELSE CAST(common_below AS DOUBLE) * 1152921504606846976.0
         |            / CAST(kth AS DOUBLE) END AS est_inter
         |FROM m""".stripMargin,

    "q_sketch_kmv" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT event_type, h,
        |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
        |        COUNT(*) OVER (PARTITION BY event_type) AS n
        |      FROM h)
        |SELECT event_type,
        |  CASE WHEN n < 32 THEN CAST(n AS DOUBLE)
        |       ELSE 31.0 * 1152921504606846976.0 / CAST(h AS DOUBLE) END AS est_users
        |FROM r WHERE rn = CASE WHEN n < 32 THEN n ELSE 32 END
        |ORDER BY event_type""".stripMargin,

    "q_zorder_layout" -> {
      s"""WITH xy AS (
         |  SELECT user_id % ${1 << ZBits} AS xb,
         |    ((epoch_us(ts) // 3600000000) % ${1 << ZBits}) AS yb
         |  FROM events),
         |z AS (SELECT xb, yb, ${zDuck("xb", "yb")} AS zval FROM xy)
         |SELECT zval // $ZBucketDiv AS zbucket, COUNT(*) AS n,
         |  MIN(xb) AS min_x, MAX(xb) AS max_x,
         |  MIN(yb) AS min_y, MAX(yb) AS max_y,
         |  MAX(xb) - MIN(xb) AS span_x, MAX(yb) - MIN(yb) AS span_y
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q_bucket_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_cdc_merge" ->
      """WITH last AS (
        |  SELECT user_id, event_type, value FROM (
        |    SELECT user_id, event_type, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |    FROM events) WHERE rn = 1)
        |SELECT COALESCE(c.c_custkey, l.user_id) AS custkey,
        |  c.c_name AS c_name,
        |  COALESCE(l.value, c.c_acctbal) AS acctbal,
        |  CASE WHEN l.user_id IS NULL THEN 'keep'
        |       WHEN c.c_custkey IS NULL THEN 'insert'
        |       ELSE 'update' END AS op
        |FROM customer c FULL OUTER JOIN last l ON c.c_custkey = l.user_id
        |WHERE l.user_id IS NULL OR l.event_type <> 'error'
        |ORDER BY custkey""".stripMargin,

    "q_skew_audit" ->
      s"""WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         |        CAST(SUM(n) AS BIGINT) AS total FROM c),
         |r AS (SELECT user_id, n,
         |        ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rank
         |      FROM c)
         |SELECT rank, user_id, n,
         |  (n * 1000000) // total AS share_ppm,
         |  (n * n_keys * 100) // total AS x_avg_100,
         |  n_keys, total
         |FROM r CROSS JOIN t WHERE rank <= $SkewTopK ORDER BY rank""".stripMargin,

    "q_para_dedup" -> {
      val max = ChunkMax // stride = max: non-overlapping windows
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w,
         |             len(string_split(lower(text), ' ')) AS n FROM documents),
         |c AS (SELECT doc_id, w, n,
         |        CASE WHEN n <= $max THEN 1
         |             ELSE 1 + CAST(ceil(CAST(n - $max AS DOUBLE) / $max) AS INT) END AS nc
         |      FROM d),
         |e AS MATERIALIZED (SELECT doc_id, chunk_id,
         |        doc_id * $ParaPack + chunk_id AS ck,
         |        md5(array_to_string(w[(chunk_id * $max + 1):(chunk_id * $max + least($max, n - chunk_id * $max))], ' ')) AS fp
         |      FROM (SELECT doc_id, w, n, UNNEST(range(0, nc)) AS chunk_id FROM c)),
         |k AS (SELECT fp, MIN(ck) AS mink FROM e GROUP BY fp)
         |SELECT e.doc_id, COUNT(*) AS n_chunks,
         |  CAST(SUM(CASE WHEN e.ck = k.mink THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(CAST(SUM(CASE WHEN e.ck = k.mink THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS kept_ratio
         |FROM e JOIN k ON e.fp = k.fp
         |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin
    },

    "q_stream_late" ->
      s"""WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS tsu,
         |    event_id + CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)
         |      % $LateJitter AS arrival_key
         |  FROM events),
         |h AS (SELECT event_type, tsu,
         |    MAX(tsu) OVER (PARTITION BY event_type
         |      ORDER BY arrival_key, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm
         |  FROM e)
         |SELECT event_type, COUNT(*) AS n_events,
         |  CAST(SUM(CASE WHEN tsu < hwm THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
         |  MAX(hwm - tsu) AS max_lag_us,
         |  (CAST(SUM(CASE WHEN tsu < hwm THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // COUNT(*) AS late_ppm
         |FROM h GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
