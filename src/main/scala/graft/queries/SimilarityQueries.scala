package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, IntegerType, LongType}

import graft.Tables
import graft.semantic.{CosineFunctions, Embed, SemanticContext}
import graft.fixtures.FixtureCorpus
import graft.fm.{QueryEngine, Settings}

/** Similarity search over the `embeddings` table (SURVEY.md §2 B22–B24 +
  * the ANN/near-dup operators the 100 TB brief adds).
  *
  * Scale design: the brute-force top-k is a linear scan with a BROADCAST
  * query set and a bounded per-group top-k aggregator (partial+final, no
  * low-cardinality window sort); the near-dup pass joins inside blocks,
  * never all-pairs; the LSH variant buckets by random-hyperplane
  * signature so candidate generation stays linear in corpus size.
  */
object SimilarityQueries {

  /** Double-precision element-wise cosine for the DuckDB oracle — matches
    * [[graft.semantic.CosineOps]] exactly; final values are cast to REAL
    * on both sides because float32 absorbs any last-ulp double noise.
    */
  private[queries] def oracleCos(a: String, b: String, dim: Int = 64): String = {
    def dot(x: String, y: String) =
      s"list_aggregate(list_transform(range(1, ${dim + 1}), i -> " +
        s"CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), 'sum')"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** Brute-force exact cosine top-k for the 8 query vectors: one pass
    * over embeddings, queries broadcast, bounded per-group top-k.
    */
  private def exactTopK(s: SparkSession, d: String, k: Int): DataFrame = {
    val e = Tables.load(s, d, "embeddings")
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val sims = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        expr("CAST(array_cosine_similarity(embedding, qvec) AS FLOAT)").as("sim"))
    topkPerQuery(s, sims, k)
  }

  /** Persisted LSH signature frame `(vec_id, embedding, sig)` — one copy
    * per (session, sf dir). The signature is the native codegen expression
    * [[graft.ops.LshSignature]] (no UDF serialization, stays inside
    * whole-stage codegen), so the frame is computed in a single scan and
    * every LSH consumer (top-k, recall, near-dup) shares it.
    */
  private val lshSigCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame])

  private def lshSigs(s: SparkSession, d: String): DataFrame =
    Tables.memo(lshSigCache, (Tables.sessionKey(s), d))({
      // plane count follows the adaptive band width; the expression
      // captures the matrix at build time so a later re-registration
      // for another dir can't rebind this frame
      graft.ops.LshFunctions.register(s,
        Similarity.hyperplanes(LshBands * lshBandBits(s, d), LshDim, seed = LshSeed))
      Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"),
          expr("graft_lsh_sig(embedding)").as("sig"))
        .persist()
    })

  private val vecGroupCache = graft.QueryCaches.register(
    scala.collection.concurrent.TrieMap.empty[(Int, String), (DataFrame, DataFrame)])
  private val neardupRepCache = graft.QueryCaches.register(
    scala.collection.concurrent.TrieMap.empty[(Int, String), (DataFrame, DataFrame)])

  /** Exact-duplicate collapse of the embedding corpus: one representative
    * (min vec_id) per distinct vector. Returns
    * (reps(embedding, rid, m), memb(rid, vec_id)). Byte-identical vectors
    * defeat every hash/cell/bucket candidate structure at once — they
    * share LSH signatures AND IVF cells, and every member pair clears any
    * similarity floor, so a dense cluster of m identical embeddings (a
    * template page embedded m times) turns any within-bucket or
    * within-cell pairwise stage quadratic in m no matter how adaptive the
    * bucket/cell capacity is (the r14 skew probe planted exactly this).
    * The groupBy and the membership rejoin are the only vector-keyed
    * shuffles, paid once per corpus (memoized); everything downstream
    * carries ids.
    */
  private def vecGroups(s: SparkSession, d: String): (DataFrame, DataFrame) =
    Tables.memo(vecGroupCache, (Tables.sessionKey(s), d))({
      val e = Tables.load(s, d, "embeddings")
      val reps = e.groupBy("embedding")
        .agg(min("vec_id").as("rid"), count(lit(1)).as("m"))
        .persist()
      val memb = e.select(col("vec_id"), col("embedding"))
        .join(reps.select(col("embedding"), col("rid")), Seq("embedding"))
        .select("rid", "vec_id")
        .persist()
      (reps, memb)
    })

  /** [[vecGroups]] with each representative's LSH signature attached (a
    * pure function of the vector, so members share it by construction).
    */
  private def neardupCollapsed(
      s: SparkSession, d: String): (DataFrame, DataFrame) =
    Tables.memo(neardupRepCache, (Tables.sessionKey(s), d))({
      val (vreps, vmemb) = vecGroups(s, d)
      val reps = vreps
        .join(lshSigs(s, d).select(col("vec_id").as("rid"), col("sig")),
          Seq("rid"))
        .persist()
      (reps, vmemb)
    })

  private val assignedCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap
    .empty[(Int, String, Int), DataFrame])
  private val assignedRepCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap
    .empty[(Int, String, Int), DataFrame])

  /** The corpus with its IVF cell id attached — the INDEX-BUILD pass
    * (nearest-of-`cells` assignment), computed once per (session,
    * corpus, iters) and shared across the IVF family (q_ann_ivf,
    * q_semdedup_incremental, q_embed_outliers), the way a deployment
    * persists the cell id as an index column with the table instead of
    * re-assigning per query. The build is the family's dominant
    * superlinear term (r17 skew-deep probe: cells grow ~n/128 below
    * [[IvfCellCap]], so assignment is O(n·cells) ≈ O(n²/128) in that
    * window — q_embed_outliers, which is nothing but this pass plus a
    * bounded aggregate, stepped 3.1× on a 2× data leg); search-side
    * work stays linear by construction (~[[IvfCellTarget]] rows per
    * probed cell). Sharing the pass amortizes the build exactly like
    * production IVF systems: index once, probe many.
    */
  private[queries] def assignedEmbeddings(s: SparkSession, d: String, iters: Int): DataFrame =
    Tables.memo(assignedCache, (Tables.sessionKey(s), d, iters))({
      graft.ops.IvfFunctions.register(s, ivfCentroids(s, d, iters))
      Tables.load(s, d, "embeddings")
        .withColumn("cell", expr("graft_ivf_cells(embedding, 1)[0]"))
        .persist()
    })

  /** [[assignedEmbeddings]] over the collapsed representative frame
    * ([[vecGroups]]): the shared index for the rep-pairing queries
    * (q_semdedup, q_knn_graph). Cell ids are a pure function of the
    * vector, so members inherit their rep's cell by construction.
    */
  private[queries] def assignedReps(s: SparkSession, d: String, iters: Int): DataFrame =
    Tables.memo(assignedRepCache, (Tables.sessionKey(s), d, iters))({
      graft.ops.IvfFunctions.register(s, ivfCentroids(s, d, iters))
      vecGroups(s, d)._1
        .withColumn("cell", expr("graft_ivf_cells(embedding, 1)[0]"))
        .persist()
    })

  /** Band expansion of the signature frame via explode (one scan of the
    * persisted frame, not a per-band union): `(vec_id, band, bucket)`.
    * Bucket population is bounded by construction (2^bandBits buckets per
    * band over a hash-uniform signature), which is what makes every join
    * on (band, bucket) scale-safe.
    */
  private def lshBands(sig: DataFrame, bits: Int): DataFrame = sig
    .select(col("vec_id"),
      explode(array((0 until LshBands).map(lit): _*)).as("band"), col("sig"))
    .withColumn("bucket",
      expr(s"shiftright(sig, band * $bits) & ${(1L << bits) - 1}"))
    .select("vec_id", "band", "bucket")

  /** LSH top-k: 16-bit random-hyperplane signatures bucket the corpus
    * (4 bands x 4 bits); candidates = same-bucket under any band; exact
    * re-rank of candidates only. Deterministic end-to-end (seeded
    * hyperplanes, double-precision projections, float-sim/vec_id total
    * order), which is what lets the DuckDB oracle replay the whole
    * structure with the plane matrix inlined.
    */
  private def lshTopK(s: SparkSession, d: String, k: Int): DataFrame = {
    val sig = lshSigs(s, d)
    val bands = lshBands(sig, lshBandBits(s, d))
    val q = bands.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("band"), col("bucket"))
    // Slim candidate ids first (distinct on two longs, not on vectors),
    // then re-attach vectors from the persisted frame for the exact
    // re-rank — the candidates→verify split q_dedup_minhash uses.
    val candIds = bands.join(q, Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
    val qe = sig.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cands = candIds
      .join(sig.select("vec_id", "embedding"), Seq("vec_id"))
      .join(broadcast(qe), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        expr("CAST(array_cosine_similarity(embedding, qvec) AS FLOAT)").as("sim"))
    topkPerQuery(s, cands, k)
  }

  private val LshDim = 64
  private val LshSeed = 42L
  private val LshBands = 4

  /** LSH band width is CORPUS-ADAPTIVE (r13 scale-probe finding: the
    * old fixed 4-bit band space = 16 buckets/band made every LSH
    * batch-vs-corpus or self join quadratic in corpus size — measured
    * 321.9× wall time for 10× data on q_ann_incremental at the 100×
    * probe). Bits per band = smallest b in [4, 12] with
    * 2^b · [[LshBandTarget]] ≥ n, an exact integer ladder (NOT a
    * floating log2 — the oracle replays the identical CASE ladder in
    * SQL, see [[lshSigOracleCtes]], and integer comparisons cannot
    * drift at boundaries). Gate corpora (≤ 2048 vectors) stay at 4
    * bits, so every existing oracle result is bit-identical; the plane
    * matrix is generated at 4·12 = 48 planes max from ONE seeded RNG
    * stream, so smaller-bit signatures are bit-prefixes of larger ones.
    */
  private[queries] val LshBandTarget = 128L
  private[queries] def lshBandBitsFor(n: Long): Int = {
    var b = 4
    while (b < 12 && n > (LshBandTarget << b)) b += 1
    b
  }
  private val lshBitsCache = graft.QueryCaches.register(
    scala.collection.concurrent.TrieMap.empty[(Int, String), Int])
  private def lshBandBits(s: SparkSession, d: String): Int =
    Tables.memo(lshBitsCache, (Tables.sessionKey(s), d))({
      lshBandBitsFor(Tables.load(s, d, "embeddings").count())
    })

  private[queries] val ProjDim = 32
  private val ProjSeed = 7702L

  /** IVF coarse-quantizer capacity is CORPUS-ADAPTIVE (r13 scale-probe
    * finding: a fixed 16-cell quantizer makes within-cell work grow
    * quadratically — measured 103.8× wall time for 10× data at the
    * 100× probe scale). Cells target ~[[IvfCellTarget]] vectors each,
    * floored at 16 — the gate fixtures (200/2k vectors at sf0.01/0.1)
    * still train EXACTLY 16 cells, so every existing oracle result is
    * bit-identical — and capped at [[IvfCellCap]], which bounds the
    * broadcast centroid matrix at 8192×64 floats (2 MB) and the Lloyd
    * stats collect at 8192×64 rows. Beyond the cap a production run
    * raises it toward √n; driver state stays O(cells), never O(n).
    * The oracle computes the same count in SQL (see [[ivfOracleCtes]]).
    */
  private[queries] val IvfCellTarget = 128
  private[queries] val IvfCellCap = 8192
  private val ivfCellsCache =
    graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), Int])
  private[queries] def ivfCellCount(s: SparkSession, d: String): Int =
    Tables.memo(ivfCellsCache, (Tables.sessionKey(s), d))({
      val n = Tables.load(s, d, "embeddings").count()
      math.max(16L, math.min(IvfCellCap.toLong, n / IvfCellTarget)).toInt
    })
  private[queries] val IvfIters = 2
  private val IvfProbes = 4

  /** Product-quantization geometry: M contiguous subspaces of SubDim
    * dims (M * SubDim = LshDim), K sub-centroids per subspace — a
    * 64-float vector compresses to M 4-bit codes. One deterministic
    * Lloyd iteration per subspace trains the codebook (seed = the K
    * lowest vec_ids' sub-vectors), mirroring the IVF trainer.
    */
  private[queries] val PqM = 8
  private[queries] val PqSubDim = LshDim / PqM
  private[queries] val PqK = 16
  private[queries] val PqIters = 1

  /** Cosine floor above which two same-cell vectors are semantic
    * duplicates (same scale as q_embed_neardup's 0.35 near-dup floor —
    * the synthetic embeddings are diffuse, so a production 0.9x floor
    * would fire on nothing).
    */
  private[queries] val SemDedupSim = 0.35

  /** Outliers reported per IVF cell by q_embed_outliers; shared with the
    * oracle.
    */
  private[queries] val OutlierK = 3

  /** Salt fan-out for the within-cell pairwise self-join (see
    * q_semdedup): spreads each cell's O(n^2) block over this many
    * partitions instead of one per cell.
    */
  private[queries] val SemDedupSalt = 8

  /** MMR selection depth; lambda = 0.7 appears as the exact integer
    * pair 7/3 in the score.
    */
  private[queries] val MmrK = 5

  /** Neighbors per vector in the all-document kNN graph (q_knn_graph). */
  private[queries] val KnnK = 3

  /** RAG retrieval parameters (q_rag_retrieve): the q_chunk_text window
    * geometry, shared with the oracle, and the fixed retrieval query.
    */
  private[queries] val RagChunkMax = PipelineQueries.ChunkMax
  private[queries] val RagChunkOverlap = PipelineQueries.ChunkOverlap
  private[queries] val RagQueryText = "spark table scan query"

  /** Cosine on the exact micro-int grid: collapse to FLOAT (absorbing
    * any last-ulp double noise), widen back, scale by 1e6, round
    * half-away-from-zero — identical digit-for-digit to the oracle's
    * `CAST(ROUND(CAST(cos AS REAL) * CAST(1000000 AS DOUBLE)) AS
    * BIGINT)`.
    */
  private def microCos(a: Column, b: Column): Column =
    round(call_function("array_cosine_similarity", a, b)
      .cast(FloatType).cast("double") * lit(1000000.0)).cast("long")

  private val pqCbCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap
    .empty[(Int, String, Int), Array[Array[Array[Float]]]])

  /** Deterministic per-subspace Lloyd training of the PQ codebook. Seed
    * sub-centroids are the PqK lowest vec_ids' sub-vectors; each
    * iteration assigns every vector's subspaces through the codegen
    * `graft_pq_codes` kernel (sequential double squared-L2, lowest code
    * on ties) and recomputes per-(subspace, code, dim) means as ONE
    * distributed hash aggregate, rounded to float32 to absorb sum-order
    * noise — the same replayable-training recipe as [[ivfCentroids]].
    * Empty codes keep their previous sub-centroid. The driver only ever
    * holds the M x K x SubDim codebook itself.
    */
  private[queries] def pqCodebook(s: SparkSession, d: String,
      iters: Int = PqIters): Array[Array[Array[Float]]] =
    Tables.memo(pqCbCache, (Tables.sessionKey(s), d, iters))({
      val e = Tables.load(s, d, "embeddings")
      val seeds = e.filter(col("vec_id") < PqK)
        .select(col("vec_id"), col("embedding"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
      var cb: Array[Array[Array[Float]]] = Array.tabulate(PqM)(m =>
        seeds.map { case (_, v) => v.slice(m * PqSubDim, (m + 1) * PqSubDim) })
      for (_ <- 1 to iters) {
        graft.ops.PqFunctions.register(s, cb)
        val means = e
          .select(expr("graft_pq_codes(embedding)").as("codes"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
          .select(expr(s"CAST(pos DIV $PqSubDim AS INT)").as("m"),
            expr(s"codes[CAST(pos DIV $PqSubDim AS INT)]").as("code"),
            expr(s"pos % $PqSubDim").as("sp"), col("v"))
          .groupBy("m", "code", "sp")
          .agg((sum(col("v").cast("double")) / count(lit(1))).cast(FloatType).as("mv"))
          .collect()
        val next = cb.map(_.map(_.clone()))
        means.foreach { r =>
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getFloat(3)
        }
        cb = next
      }
      cb
    })

  private val ivfCentCache = graft.QueryCaches.register(scala.collection.concurrent.TrieMap
    .empty[(Int, String, Int), Array[(Long, Array[Float])]])

  /** Deterministic Lloyd training of the IVF coarse quantizer. Init =
    * the `ivfCellCount` lowest vec_ids; each iteration assigns every vector
    * to its nearest centroid (sequential double cosine, argmax with cid
    * tie-break) and recomputes per-cell means as a distributed hash
    * aggregate, rounding each mean to float32 — the same
    * sum-order-absorbing cast q_embed_centroids uses, which is what lets
    * the DuckDB oracle replay the training loop bit-exactly. Empty cells
    * keep their previous centroid. The driver only ever holds the
    * centroid matrix itself (cells x dim — the broadcast-kmeans
    * pattern); assignment and means stay distributed.
    */
  private[queries] def ivfCentroids(s: SparkSession, d: String, iters: Int): Array[(Long, Array[Float])] =
    Tables.memo(ivfCentCache, (Tables.sessionKey(s), d, iters))({
      val e = Tables.load(s, d, "embeddings")
      var cents: Array[(Long, Array[Float])] = e.filter(col("vec_id") < ivfCellCount(s, d))
        .select(col("vec_id"), col("embedding"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
      for (_ <- 1 to iters) {
        // Assignment runs through the codegen expression (re-registered
        // with this iteration's centroids; frames are built AND collected
        // inside the iteration, so the rebind is safe).
        graft.ops.IvfFunctions.register(s, cents)
        val means = e.withColumn("cell", expr("graft_ivf_cells(embedding, 1)[0]"))
          .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy("cell", "pos")
          .agg((sum(col("v").cast("double")) / count(lit(1))).cast(FloatType).as("mv"))
          .collect()
        val byCell = means.groupBy(_.getLong(0)).map { case (cid, rows) =>
          val a = new Array[Float](LshDim)
          rows.foreach(r => a(r.getInt(1)) = r.getFloat(2))
          (cid, a)
        }
        cents = cents.map { case (cid, old) => (cid, byCell.getOrElse(cid, old)) }
      }
      cents
    })

  /** Quantizer quality diagnostics for the spec: (max cell population,
    * mean assigned cosine). Balance is what training buys at 100 TB — a
    * hot cell is a hot partition — and the mean assigned cosine is the
    * (monotone under Lloyd) clustering objective.
    */
  private[queries] def ivfDiagnostics(s: SparkSession, d: String, iters: Int): (Long, Double) = {
    val e = Tables.load(s, d, "embeddings")
    val cs = ivfCentroids(s, d, iters)
    val best = udf { (v: Seq[Float]) =>
      val arr = v.toArray
      cs.map { case (cid, c) => (Similarity.cosine(arr, c), cid) }
        .minBy { case (sim, cid) => (-sim, cid) }
    }
    val a = e.select(best(col("embedding")).as("b"))
      .select(col("b._2").as("cell"), col("b._1").as("sim"))
    val sizes = a.groupBy("cell").count().agg(max("count")).collect()(0).getLong(0)
    val obj = a.agg(avg("sim")).collect()(0).getDouble(0)
    (sizes, obj)
  }

  /** IVF probe + exact re-rank against centroids trained for `iters`
    * Lloyd iterations (iters = 0 reproduces the untrained seed
    * quantizer, kept reachable for the recall-improvement spec).
    */
  private[queries] def ivfTopK(s: SparkSession, d: String, k: Int, iters: Int): DataFrame = {
    // Registered BEFORE any Dataset using array_cosine_similarity is
    // constructed: Dataset analysis is eager, so a later registration
    // would leave the expr unresolved on a fresh session.
    CosineFunctions.register(s)
    val centroids = ivfCentroids(s, d, iters)
    // Assignment + probing via the codegen graft_ivf_cells expression
    // (centroids as a plan constant) — no per-row UDF on the hot path.
    graft.ops.IvfFunctions.register(s, centroids)
    val assigned = assignedEmbeddings(s, d, iters)
    val q = assigned.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        explode(expr(s"graft_ivf_cells(embedding, $IvfProbes)")).as("cell"))
    val cands = assigned.join(q, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        expr("CAST(array_cosine_similarity(embedding, qvec) AS FLOAT)").as("sim"))
      .distinct()
    topkPerQuery(s, cands, k)
  }

  /** Exact top-k per query via the declarative bounded aggregate —
    * codegen'd partial+final aggregation, O(k) per-group state; ordering
    * by (float sim DESC, vec_id) is encoded as the struct sort key
    * (negated sim leads) and reproduced identically by the oracle's
    * ROW_NUMBER window.
    */
  private def topkPerQuery(spark: SparkSession, sims: DataFrame, k: Int): DataFrame = {
    graft.ops.GraftAggregates.register(spark)
    sims
      .groupBy("qid")
      .agg(expr(s"graft_top_k(struct(-sim AS s, vec_id AS v, sim AS sim), $k)").as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.v").as("vec_id"), col("t.sim").as("sim"))
      .orderBy(col("qid"), col("sim").desc, col("vec_id"))
  }

  /** Every AnnIncrMod-th vec id (remainder AnnIncrRem) plays the "newly
    * arrived embedding batch" for the incremental ANN operator.
    */
  private[queries] val AnnIncrMod = 10
  private[queries] val AnnIncrRem = 7

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B22: brute-force cosine top-5 for 8 query vectors — the exact
    // baseline: one pass over embeddings, queries broadcast, bounded
    // per-group top-k aggregation.
    "q_cosine_topk" -> ((s, d) => {
      CosineFunctions.register(s)
      exactTopK(s, d, 5)
    }),

    // Incremental ANN ingest: a newly-arrived embedding batch searched
    // against the indexed corpus through the SAME LSH bucket structure
    // q_ann_lsh uses — bucket-to-bucket candidates, exact cosine re-rank,
    // bounded top-3 per new vector. The batch side is NOT broadcast (an
    // ingest batch can be arbitrarily large); candidates join on
    // (band, bucket) where population is bounded by construction, then on
    // qid — both plain shuffle joins that scale with the batch. The
    // symmetric operator to q_dedup_incremental on the embedding tier.
    "q_ann_incremental" -> ((s, d) => {
      CosineFunctions.register(s)
      val sig = lshSigs(s, d)
      val bands = lshBands(sig, lshBandBits(s, d))
      val batch = bands.filter(col("vec_id") % AnnIncrMod === AnnIncrRem)
        .select(col("vec_id").as("qid"), col("band"), col("bucket"))
      val corpus = bands.filter(col("vec_id") % AnnIncrMod =!= AnnIncrRem)
      val candIds = corpus.join(batch, Seq("band", "bucket"))
        .select("qid", "vec_id").distinct()
      val qe = sig.filter(col("vec_id") % AnnIncrMod === AnnIncrRem)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cands = candIds
        .join(sig.select("vec_id", "embedding"), Seq("vec_id"))
        .join(qe, Seq("qid"))
        .select(col("qid"), col("vec_id"),
          expr("CAST(array_cosine_similarity(embedding, qvec) AS FLOAT)").as("sim"))
      topkPerQuery(s, cands, 3)
    }),

    // B23-adjacent: embedding near-duplicate pairs — LSH-band candidate
    // generation + exact cosine verification of candidates only, the same
    // candidates→verify split as q_dedup_minhash. No unbounded join key
    // anywhere: pair fan-out is capped by bucket population (hash-uniform
    // 4-bit buckets per band), unlike the label-blocked all-pairs join
    // this replaces, whose hottest block was quadratic.
    "q_embed_neardup" -> ((s, d) => {
      CosineFunctions.register(s)
      // EXACT-DUPLICATE COLLAPSE first (r14 skew probe — the
      // q_multimodal_phash pattern): byte-identical vectors share LSH
      // signatures, land in the same bucket in EVERY band, and every
      // member pair clears the sim floor, so a dense cluster of m
      // identical embeddings (a template page embedded m times — 10% of
      // the adversarial corpus) costs bands × m²/2 candidate rows when
      // joined per-vector (38 s at skew-x10 vs 1.4 s uniform). The band
      // self-join now runs over DISTINCT vectors only; member pairs
      // expand algebraically afterwards, so a dense cluster costs its
      // m²/2 genuine near-dup OUTPUT rows, never bands × that, and the
      // pair-dedup aggregate shrinks to rep pairs. Results are
      // bit-identical: members inherit their rep's signature and
      // cosine is evaluated on the same vector bytes.
      val (reps, memb) = neardupCollapsed(s, d)
      // shuffle_hash on both joins below (r17): neither the exploded
      // band frame nor the rep-embedding projection ever qualifies for
      // auto-broadcast, so both planned as SMJ — two sorts per join for
      // pure equi-joins that need no ordering at any scale.
      val rb = lshBands(reps.select(col("rid").as("vec_id"), col("sig")),
          lshBandBits(s, d))
        .join(reps.select(col("rid").as("vec_id"), col("embedding"))
          .hint("shuffle_hash"), Seq("vec_id"))
      // cosine INSIDE the band join, filter BEFORE the pair dedup
      // (r13 scale probe: the former distinct-then-rejoin shape carried
      // the 64-float embeddings onto every candidate pair row through
      // two sort-merge joins at 100× — ~10 GB of shuffled vectors,
      // 220 s; both sides of the band join already HOLD the vectors,
      // and the ≥0.35 floor commutes with the distinct, so the dedup
      // shuffle carries only near-dup (ra, rb, sim) triples)
      val crossRep = rb.select(col("vec_id").as("ra"), col("band"),
          col("bucket"), col("embedding").as("va"))
        .join(rb.select(col("vec_id").as("rb"), col("band"), col("bucket"),
          col("embedding").as("vb")).hint("shuffle_hash"), Seq("band", "bucket"))
        .filter(col("ra") < col("rb"))
        .select(col("ra"), col("rb"),
          expr("array_cosine_similarity(va, vb)").as("sim_d"))
        .filter(col("sim_d") >= 0.35)
        .groupBy("ra", "rb")
        .agg(min(col("sim_d")).as("sim_d")) // multi-band duplicates: sim identical
      // cross-rep member expansion: every member combo is a pair at the
      // rep pair's sim; member ids can interleave across reps, so order
      // each combo explicitly
      val crossPairs = crossRep
        .join(memb.select(col("rid").as("ra"), col("vec_id").as("ia0")), Seq("ra"))
        .join(memb.select(col("rid").as("rb"), col("vec_id").as("ib0")), Seq("rb"))
        .select(least(col("ia0"), col("ib0")).as("ia"),
          greatest(col("ia0"), col("ib0")).as("ib"), col("sim_d"))
      // within-rep: identical vectors — one cosine per rep, m²/2 pairs
      val selfPairs = reps.filter(col("m") >= 2)
        .select(col("rid"),
          expr("array_cosine_similarity(embedding, embedding)").as("sim_d"))
        // an all-zero-vector group's self-cosine is NaN, and Spark's
        // comparison semantics order NaN ABOVE every number — so NaN >=
        // 0.35 is TRUE and degenerate groups PASS, exactly as they
        // passed the pairwise path's identical predicate (the filter
        // exists for real sub-threshold sims, not as a NaN guard)
        .filter(col("sim_d") >= 0.35)
        .join(memb.select(col("rid"), col("vec_id").as("ia")), Seq("rid"))
        .join(memb.select(col("rid"), col("vec_id").as("ib")), Seq("rid"))
        .filter(col("ia") < col("ib"))
        .select("ia", "ib", "sim_d")
      crossPairs.union(selfPairs)
        .select(col("ia"), col("ib"), col("sim_d").cast(FloatType).as("sim"))
        .orderBy(col("ia"), col("ib"))
    }),

    // ANN scale path: banded random-hyperplane LSH. Approximate relative
    // to the exact scan, but fully DETERMINISTIC (seeded hyperplanes,
    // sequential double-precision projections, total ordering), so the
    // oracle replays the entire structure with the plane matrix inlined —
    // hash-green, not rows-only.
    "q_ann_lsh" -> ((s, d) => {
      CosineFunctions.register(s)
      lshTopK(s, d, 5)
    }),

    // Driver-visible ANN quality artifact (VERDICT r2 item 4): per-query
    // recall@5 of the LSH path against the exact scan. Every column is
    // replayed by the oracle (which recomputes BOTH top-5 sets), so the
    // CORRECTNESS gate itself now pins the quality numbers.
    "q_ann_lsh_recall" -> ((s, d) => {
      CosineFunctions.register(s)
      val k = 5
      // Both top-k frames are ≤ 8 queries × k rows BY CONSTRUCTION, but
      // their aggregate-output stats never qualify for auto-broadcast,
      // so these joins planned as SMJ (4 sorts for ~40-row inputs).
      // Broadcast is unconditionally safe here — bounded by the fixed
      // query set at any corpus size (r17).
      val exact = exactTopK(s, d, k).select("qid", "vec_id")
      val approx = lshTopK(s, d, k).select("qid", "vec_id")
      val hits = exact.join(broadcast(approx), Seq("qid", "vec_id"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("hits"))
      exact.groupBy("qid").agg(count(lit(1)).as("n_exact"))
        .join(broadcast(hits), Seq("qid"), "left")
        .na.fill(0L, Seq("hits"))
        .select(col("qid"), lit(k).as("k"), col("hits"),
          (col("hits").cast("double") / col("n_exact").cast("double")).as("recall"))
        .orderBy("qid")
    }),

    // Vector aggregation: per-label mean embedding (centroid computation,
    // the training step behind IVF/clustering). posexplode → per-(label,
    // dimension) sums — a plain hash aggregate, no vector UDAF needed;
    // float cast absorbs double sum-order noise on both sides.
    "q_embed_centroids" -> ((s, d) => {
      Tables.load(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg((sum(col("v").cast("double")) / count(lit(1))).cast(FloatType).as("mean_v"))
        .orderBy("label", "pos")
    }),

    // ANN scale path #2 — IVF with a TRAINED coarse quantizer:
    // deterministic Lloyd iterations (seed centroids = the 16 lowest
    // vec_ids, fixed iteration count, double-precision argmax with cid
    // tie-break, per-iteration means rounded to float32 so sum-order
    // noise is absorbed on both sides). Every vector is assigned to its
    // nearest trained centroid in one pass over a broadcast centroid
    // table; queries probe the 4 nearest cells and exact-re-rank only
    // those candidates. At 100 TB the assignment is a write-once
    // partition key (cluster-pruned scans) and training cost is
    // iterations x one scan. Fully deterministic, so the oracle replays
    // the whole structure INCLUDING the training loop.
    "q_ann_ivf" -> ((s, d) => ivfTopK(s, d, 5, IvfIters)),

    // ANN scale path #3 — product quantization with ADC scoring: each
    // vector compresses to 8 four-bit codes (64x smaller than float32),
    // assigned by the codegen graft_pq_codes kernel against a trained
    // per-subspace codebook. Queries precompute an 8 x 16 distance
    // table (driver-side: queries x codebook is broadcast-sized BY
    // DEFINITION), quantized to an integer micro-grid so the per-vector
    // ADC sum is an order-independent BIGINT — the asymmetric-distance
    // scan that makes billion-vector rankings run entirely over the
    // compressed tier, touching no raw floats. Deterministic end to
    // end: the oracle replays the training, the codes, the table, and
    // the ranking.
    "q_ann_pq" -> ((s, d) => {
      val e = Tables.load(s, d, "embeddings")
      val cb = pqCodebook(s, d)
      graft.ops.PqFunctions.register(s, cb)
      graft.ops.GraftAggregates.register(s)
      val codes = e.select(col("vec_id"),
        posexplode(expr("graft_pq_codes(embedding)")).as(Seq("m", "code")))
      val qs = e.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
      val tabRows = for {
        (qid, qv) <- qs.toSeq
        m <- 0 until PqM
        c <- 0 until PqK
      } yield {
        var d2 = 0.0
        var i = 0
        while (i < PqSubDim) {
          val x = qv(m * PqSubDim + i).toDouble - cb(m)(c)(i)
          d2 += x * x
          i += 1
        }
        (qid, m, c, math.round(d2 * 1000000))
      }
      import s.implicits._
      val tab = tabRows.toDF("qid", "m", "code", "dmicro")
      codes.join(broadcast(tab), Seq("m", "code"))
        .filter(col("vec_id") =!= col("qid"))
        .groupBy("qid", "vec_id")
        .agg(sum("dmicro").as("d_adc"))
        .groupBy("qid")
        .agg(expr("graft_top_k(struct(d_adc AS s, vec_id AS v), 5)").as("top"))
        .select(col("qid"), explode(col("top")).as("t"))
        .select(col("qid"), col("t.v").as("vec_id"), col("t.s").as("d_adc"))
        .orderBy(col("qid"), col("d_adc"), col("vec_id"))
    }),

    // Embedding compression for the 100 TB store: symmetric per-vector
    // int8 quantization (scale = max|x|/127, round-half-up) — 4x smaller
    // vectors for the ANN candidate tier. Entirely deterministic integer
    // + double arithmetic, so the oracle replays quantized values, their
    // checksum, and the reconstruction error exactly. All codegen column
    // expressions; `scale`/`qv` are materialized as columns first because
    // Catalyst lambdas don't CSE subexpressions.
    "q_embed_quantize" -> ((s, d) => {
      quantized(Tables.load(s, d, "embeddings"))
        .select(col("vec_id"), col("scale"),
          expr("aggregate(qv, 0L, (a, v) -> a + CAST(v AS BIGINT))").as("qsum"),
          expr("CAST(aggregate(zip_with(qv, embedding, (q, x) -> abs(q * scale - CAST(x AS DOUBLE))), CAST(0.0 AS DOUBLE), (a, v) -> a + v) / 64 AS FLOAT)").as("mae"))
        .orderBy("vec_id")
    }),

    // Johnson–Lindenstrauss random projection to ProjDim dims — the
    // other embedding-compression tier (quantization shrinks bytes per
    // dim; projection shrinks dims). The plane matrix is a seeded
    // plan-time constant inside a codegen expression, so the projection
    // is a single embarrassingly-parallel scan; flattened output
    // (vec_id, pos, val) keeps the oracle comparison scalar.
    "q_embed_project" -> ((s, d) => {
      graft.ops.ProjFunctions.register(s,
        Similarity.hyperplanes(ProjDim, LshDim, seed = ProjSeed))
      Tables.load(s, d, "embeddings")
        .select(col("vec_id"),
          posexplode(expr("graft_project(embedding)")).as(Seq("pos", "val")))
        .orderBy("vec_id", "pos")
    }),

    // ANN over the quantized tier: cosine on int8 vectors needs NO
    // dequantization — the per-vector scales cancel, so similarity is
    // exact integer dot/norms plus one double division (bit-reproducible
    // in SQL, unlike float accumulation). The scan reads 1/4 the bytes of
    // the float tier; at 100 TB this is the memory-resident candidate
    // pass, with exact float re-rank reserved for the survivors.
    "q_ann_quantized" -> ((s, d) => {
      graft.ops.GraftAggregates.register(s)
      // All-zero vectors quantize to nrm 0; cosine is undefined for them
      // and the division would raise under ANSI — drop them from both
      // sides. The guard tests the RAW embedding (any nonzero element ⟺
      // nrm > 0, the oracle's form of the predicate) BEFORE the quantize
      // projection: a filter on the computed nrm column would inline the
      // whole quantization lambda chain into the filter condition after
      // projection collapse and execute it twice per row.
      val e = quantized(Tables.load(s, d, "embeddings")
          .filter(expr("exists(embedding, x -> x != CAST(0.0 AS FLOAT))")))
        .select(col("vec_id"), col("qv"),
          expr("aggregate(zip_with(qv, qv, (x, y) -> CAST(x AS BIGINT) * y), 0L, (a, v) -> a + v)").as("nrm"))
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("qv").as("qv2"), col("nrm").as("nrm2"))
      val sims = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("dq",
          expr("aggregate(zip_with(qv, qv2, (x, y) -> CAST(x AS BIGINT) * y), 0L, (a, v) -> a + v)"))
        .select(col("qid"), col("vec_id"),
          expr("CAST(dq / (sqrt(CAST(nrm AS DOUBLE)) * sqrt(CAST(nrm2 AS DOUBLE))) AS FLOAT)").as("sim"))
      topkPerQuery(s, sims, 5)
    }),

    // SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    // Data-efficient learning at web-scale through semantic
    // deduplication"): cluster with the trained IVF coarse quantizer,
    // compute pairwise cosine ONLY within a cell, and keep one canonical
    // vector (min id) per connected near-dup group. This is the scale
    // path for embedding dedup — all-pairs is O(n^2) and dies at corpus
    // scale, while per-cell pairwise is O(sum cell^2) with balanced
    // cells, each cell's block co-located by the `cell` shuffle key.
    // Cluster labeling reuses the pointer-jumping min-label components
    // op; the oracle replays quantizer training, assignment, and the
    // closure with a recursive CTE.
    "q_semdedup" -> ((s, d) => {
      CosineFunctions.register(s)
      graft.ops.IvfFunctions.register(s, ivfCentroids(s, d, IvfIters))
      // EXACT-DUPLICATE COLLAPSE first (r14 skew probe): byte-identical
      // vectors always co-cell and every member pair clears the sim
      // floor, so a cluster of m identical embeddings makes the
      // within-cell pairwise block quadratic in m REGARDLESS of the
      // corpus-adaptive cell count (which only bounds the AVERAGE cell
      // population) — 35 s at skew-x50 vs 1.8 s at x10 before the
      // collapse. Pairwise + connected components run over distinct
      // vectors; a star edge rep→member per duplicate group yields
      // exactly the components of the member-level graph (every member
      // edge routes through its rep, whose vector is byte-equal), and
      // the keeper (min id in component) is preserved because each rep
      // IS its group's min vec_id.
      val (vreps, vmemb) = vecGroups(s, d)
      val assigned = assignedReps(s, d, IvfIters)
      // Salted self-join: the join key is (cell, salt), not bare cell —
      // with only ivfCellCount distinct cells, a cell-keyed shuffle would cap
      // the pairwise stage at cell-count-way parallelism on a 1000-executor
      // cluster. Side A pins salt = ra % SemDedupSalt; side B replicates
      // each row across all salts, so every (ra, rb) pair still meets
      // exactly once while each cell's O(n_c^2) block spreads over
      // SemDedupSalt partitions. The cell count itself is corpus-
      // adaptive (ivfCellCount: ~IvfCellTarget vectors per cell), so
      // n_c — and with it the per-cell quadratic block — stays CONSTANT
      // as the corpus grows; the r13 scale probe measured the old fixed
      // 16-cell quantizer at 103.8× wall time for 10× data.
      val a = assigned
        .select(col("cell"), col("rid").as("ia"), col("embedding").as("va"))
        .withColumn("salt", expr(s"ia % $SemDedupSalt"))
      val b = assigned
        .select(col("cell"), col("rid").as("ib"), col("embedding").as("vb"))
        .withColumn("salt", explode(expr(s"sequence(0, ${SemDedupSalt - 1})")))
      // shuffle_hash (r17): neither salted side's stats ever qualify
      // for broadcast, so the block join planned as SMJ — two sorts of
      // embedding-carrying frames for an equi-join needing no ordering.
      // The hint goes on side A (build side): B is salt-replicated,
      // SemDedupSalt× larger per partition.
      val repPairs = a.hint("shuffle_hash").join(b, Seq("cell", "salt"))
        .filter(col("ia") < col("ib"))
        .filter(expr("array_cosine_similarity(va, vb)") >= SemDedupSim)
        .select("ia", "ib")
      // star edges rep→member, gated by the same self-cosine predicate
      // the pairwise path used. NOTE (r15): a zero-vector group's
      // self-cosine is NaN and Spark orders NaN ABOVE every number, so
      // NaN >= SemDedupSim is TRUE and identical zero-vector groups DO
      // connect — matching the pairwise path (whose NaN-sim pairs
      // passed the same predicate), which is what exactness requires
      val starEdges = vreps.filter(col("m") >= 2)
        .filter(expr("array_cosine_similarity(embedding, embedding)") >= SemDedupSim)
        .select(col("rid"))
        .join(vmemb, Seq("rid"))
        .filter(col("vec_id") =!= col("rid"))
        .select(col("rid").as("ia"), col("vec_id").as("ib"))
      val pairs = repPairs.union(starEdges)
      graft.ops.ConnectedComponents.labelPropagate(s, pairs)
        .filter(col("label") < col("node"))
        .select(col("node").as("vec_id"), col("label").as("keeper"))
        // members inherit their rep's cell (byte-equal vectors);
        // shuffle_hash: both sides corpus-sized, no ordering needed (r17)
        .join(vmemb.join(assigned.select(col("rid"), col("cell")), Seq("rid"))
          .select(col("vec_id"), col("cell")).hint("shuffle_hash"), Seq("vec_id"))
        .select("vec_id", "keeper", "cell")
        .orderBy("vec_id")
    }),

    // All-document kNN graph — the neighbor-list builder behind
    // embedding-based clustering, label propagation, and graph dedup:
    // EVERY vector's KnnK most-similar cell mates (not 8 fixed query
    // vectors — the symmetric all-kNN join). Cluster-then-pairwise, the
    // same scale shape as q_semdedup: one codegen cell assignment, the
    // within-cell self-join salted over (cell, salt) so each O(n_c^2)
    // block spreads across SemDedupSalt partitions, and per-vector
    // selection through the bounded graft_top_k aggregate (O(k) state,
    // partial+final, no global window). At production scale the cell
    // count grows ~sqrt(N) so blocks stay constant-size; it is small
    // here so the oracle can replay training + assignment + ranking
    // exactly on the integer micro-grid.
    "q_knn_graph" -> ((s, d) => {
      CosineFunctions.register(s)
      graft.ops.GraftAggregates.register(s)
      graft.ops.IvfFunctions.register(s, ivfCentroids(s, d, IvfIters))
      // EXACT-DUPLICATE COLLAPSE for top-k (r14, closing the finding-10
      // exposure this query carried): a cell of m byte-identical
      // vectors made the within-cell self-join Ω(m²). Unlike top-1,
      // top-k results legitimately contain MULTIPLE members of one
      // duplicate group, and equal-sim groups interleave members by
      // vec_id — so the collapse ranks (sim, member_id) pairs directly
      // over each group's CLUB: its min(KnnK+1, m) smallest member ids,
      // the only members that can appear in ANY vector's top-KnnK
      // (a non-club member y of group h has ≥ KnnK+1 candidates with
      // strictly better (sim, id) keys — h's club at the same sim with
      // smaller ids — so y survives no top-(KnnK+1) even after one
      // self-exclusion). Per group g: top-(KnnK+1) over club members of
      // all cell groups (own group included at the self-cosine); per
      // member x: drop x from g's sorted list, keep the first KnnK —
      // exact because top-KnnK of (stream \ x) ⊆ top-(KnnK+1) of stream
      // and Σ min(KnnK+1, m_h) ≥ min(KnnK+1, Σ m_h) keeps the list long
      // enough whenever x has that many true candidates. Candidate
      // volume is ≤ the uncollapsed join always (club ≤ members) and
      // ≪ it on dup-heavy corpora.
      val (vreps, vmemb) = vecGroups(s, d)
      val assigned = assignedReps(s, d, IvfIters)
      val club = vmemb
        .groupBy("rid")
        .agg(expr(s"graft_top_k(struct(vec_id AS s, vec_id AS v), ${KnnK + 1})").as("cl"))
        .select(col("rid").as("nrid"), explode(col("cl")).as("c"))
        .select(col("nrid"), col("c.v").as("nid"))
      val a = assigned
        .select(col("cell"), col("rid").as("qrid"), col("embedding").as("va"))
        .withColumn("salt", expr(s"qrid % $SemDedupSalt"))
      val b = assigned
        .select(col("cell"), col("rid").as("nrid"), col("embedding").as("vb"))
        .join(club, Seq("nrid"))
        .withColumn("salt", explode(expr(s"sequence(0, ${SemDedupSalt - 1})")))
      val grpTop = a.join(b, Seq("cell", "salt"))
        .select(col("qrid"), col("nid"), microCos(col("va"), col("vb")).as("sim"))
        .groupBy("qrid")
        .agg(expr(s"graft_top_k(struct(-sim AS s, nid AS v, sim AS sim), ${KnnK + 1})").as("top"))
      // shuffle_hash (r17): grpTop's aggregate stats never broadcast and
      // the join planned as SMJ, sorting both corpus-sized sides for an
      // equi-join that needs no ordering; hash-build the rep-sized
      // top-k side instead.
      vmemb.select(col("rid").as("qrid"), col("vec_id").as("qid"))
        .join(grpTop.hint("shuffle_hash"), Seq("qrid"))
        .select(col("qid"),
          expr(s"slice(filter(top, t -> t.v != qid), 1, $KnnK)").as("top"))
        .select(col("qid"), explode(col("top")).as("t"))
        .select(col("qid"), col("t.v").as("nid"), col("t.sim").as("sim_micro"))
        .orderBy(col("qid"), col("sim_micro").desc, col("nid"))
    }),

    // Incremental SemDeDup — the ingest path of q_semdedup, completing
    // the incremental triad (q_dedup_incremental, q_ann_incremental):
    // a newly-arrived embedding batch is checked against the EXISTING
    // corpus through the already-trained coarse quantizer. Batch and
    // corpus assign to cells in one codegen pass; candidates are the
    // same-cell corpus vectors only; each batch vector keeps its single
    // best match through the bounded top-1 aggregate (O(1) state, no
    // window) and is flagged dup at the SemDeDup floor. Never a
    // batch x corpus product, no re-clustering of the world.
    "q_semdedup_incremental" -> ((s, d) => {
      CosineFunctions.register(s)
      graft.ops.GraftAggregates.register(s)
      graft.ops.IvfFunctions.register(s, ivfCentroids(s, d, IvfIters))
      val e = assignedEmbeddings(s, d, IvfIters)
      val batch = e.filter(col("vec_id") % AnnIncrMod === AnnIncrRem)
        .select(col("cell"), col("vec_id").as("bid"), col("embedding").as("bv"))
      // corpus side collapsed to one rep per distinct vector (r14 skew
      // finding 10): a dense cell of m identical corpus embeddings
      // multiplies every batch row's candidate scan by m; top-1 with
      // the (sim DESC, mid ASC) tie-break is EXACTLY rep-equivalent —
      // all members of a duplicate group share the sim and the
      // preferred (smallest) mid IS the group's min, i.e. the rep.
      // (Top-k>1 queries like q_ann_incremental can NOT collapse:
      // duplicate members legitimately occupy multiple result slots.)
      // The collapse is subset-local — the rep must be the min mid
      // WITHIN the corpus split, not vecGroups' global min, which
      // could be a batch row.
      val corpus = e.filter(col("vec_id") % AnnIncrMod =!= AnnIncrRem)
        .groupBy("embedding", "cell")
        .agg(min("vec_id").as("mid"))
        .select(col("cell"), col("mid"), col("embedding").as("mv"))
      batch.join(corpus, Seq("cell"))
        .select(col("bid"), col("cell"), col("mid"),
          expr("array_cosine_similarity(bv, mv)").as("sim_d"))
        .groupBy("bid", "cell")
        .agg(expr("graft_top_k(struct(-sim_d AS s, mid AS m, sim_d AS sim_d), 1)").as("top"))
        .select(col("bid").as("vec_id"), col("cell"), explode(col("top")).as("t"))
        .select(col("vec_id"), col("cell"), col("t.m").as("match_id"),
          col("t.sim_d").cast(FloatType).as("sim"),
          (col("t.sim_d") >= SemDedupSim).as("dup"))
        .orderBy("vec_id")
    }),

    // Embedding outlier detection (the CLIP-filtering move): vectors
    // farthest from their own trained-IVF centroid are noise/mislabeled
    // candidates — per cell, the OutlierK lowest own-centroid cosines.
    // Shape: codegen cell assignment, the 16-row centroid table
    // broadcast back, and the per-cell bottom-k through the bounded
    // `graft_top_k` aggregate (O(k) state, no window sort) — one scan
    // over the corpus regardless of cell count. Cosines live on the
    // micro-int grid so the oracle replays them digit-for-digit.
    "q_embed_outliers" -> ((s, d) => {
      CosineFunctions.register(s)
      graft.ops.GraftAggregates.register(s)
      val cents = ivfCentroids(s, d, IvfIters)
      graft.ops.IvfFunctions.register(s, cents)
      import s.implicits._
      val centDF = broadcast(cents.toSeq.toDF("cell", "cv"))
      assignedEmbeddings(s, d, IvfIters)
        .join(centDF, Seq("cell"))
        .select(col("cell"), col("vec_id"),
          microCos(col("embedding"), col("cv")).as("own_cos_micro"))
        .groupBy("cell")
        .agg(expr("graft_top_k(struct(own_cos_micro AS s, vec_id AS v," +
          s" own_cos_micro AS c), $OutlierK)").as("low"))
        .select(col("cell"), posexplode(col("low")).as(Seq("i", "o")))
        .select(col("cell"), (col("i") + 1).as("rank"),
          col("o.v").as("vec_id"), col("o.c").as("own_cos_micro"))
        .orderBy("cell", "rank")
    }),

    // Maximal-marginal-relevance reranking (Carbonell & Goldstein 1998):
    // greedy top-MmrK selection maximizing lambda*relevance -
    // (1-lambda)*max-similarity-to-already-picked (lambda = 0.7, scaled
    // to integers 7/3) — the diversity-aware context-selection step of
    // a RAG/retrieval pipeline. Each of the MmrK steps is ONE
    // distributed argmax over the candidate scan with the picked
    // vectors broadcast as plan constants (O(k) driver state, the
    // trained-structure pattern); scores live on an exact micro-int
    // grid via the float-collapse rule so the unrolled-CTE oracle
    // replays every tie-break bit-for-bit.
    "q_mmr_rerank" -> ((s, d) => {
      CosineFunctions.register(s)
      val e = Tables.load(s, d, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .collect()(0).getSeq[Float](0)
      val cand = e.filter(col("vec_id") > 0)
        .select(col("vec_id"), col("embedding"),
          microCos(col("embedding"), typedLit(qv)).as("rel"))
      var picked = Vector.empty[(Int, Long, Long, Long)]
      var selVecs = Vector.empty[Seq[Float]]
      for (k <- 1 to MmrK) {
        val ms =
          if (selVecs.isEmpty) lit(0L)
          else if (selVecs.size == 1) microCos(col("embedding"), typedLit(selVecs(0)))
          else greatest(selVecs.map(v => microCos(col("embedding"), typedLit(v))): _*)
        val ids = picked.map(_._2)
        val top = cand
          .filter(if (ids.isEmpty) lit(true) else !col("vec_id").isInCollection(ids))
          .withColumn("ms", ms)
          .withColumn("score", lit(7L) * col("rel") - lit(3L) * col("ms"))
          .orderBy(col("score").desc, col("vec_id"))
          .limit(1)
          .select("vec_id", "rel", "ms", "embedding")
          .collect()(0)
        picked :+= ((k, top.getLong(0), top.getLong(1), top.getLong(2)))
        selVecs :+= top.getSeq[Float](3)
      }
      val rows = picked.map { case (k, id, rel, ms) =>
        org.apache.spark.sql.Row(k, id, rel, ms, 7L * rel - 3L * ms)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("step", IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("vec_id", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rel_micro", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("maxsim_micro", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("score_micro", LongType, nullable = false)))
      s.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
        .orderBy("step")
    }),

    // RAG retrieval end-to-end: sliding-window chunking (the q_chunk_text
    // parameters) → per-chunk embedding through the TextEncoder seam →
    // cosine against a fixed query vector → global top-5. At 100 TB the
    // shape holds: one narrow explode per document (no shuffle), the
    // query vector is a plan constant, embedding is an executor-local
    // map (the seam where a real batched ONNX encoder sits — same
    // stub-kernel architecture as the multimodal decode), and the final
    // ORDER BY+LIMIT plans as TakeOrderedAndProject, never a global
    // sort. The oracle replays chunking, the feature-hash encoder, and
    // the ranking in SQL.
    "q_rag_retrieve" -> ((s, d) => {
      CosineFunctions.register(s)
      val stride = RagChunkMax - RagChunkOverlap
      val qvec = Embed.encode(RagQueryText, Embed.DefaultDim)
      val qArr = s"array(${qvec.map(f => s"CAST('$f' AS FLOAT)").mkString(", ")})"
      val embedUdf = udf((t: String) => Embed.encode(t, Embed.DefaultDim))
      Tables.load(s, d, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
        .withColumn("n", size(col("w")))
        .withColumn("nc", expr(
          s"CASE WHEN n <= $RagChunkMax THEN 1 ELSE 1 + CAST(ceil(CAST(n - $RagChunkMax AS DOUBLE) / $stride) AS INT) END"))
        .select(col("doc_id"), explode(expr("sequence(0, nc - 1)")).as("chunk_id"),
          col("w"), col("n"))
        .select(col("doc_id"), col("chunk_id"),
          expr(s"concat_ws(' ', slice(w, chunk_id * $stride + 1, " +
            s"least($RagChunkMax, n - chunk_id * $stride)))").as("ctext"))
        .withColumn("emb", embedUdf(col("ctext")))
        .select(col("doc_id"), col("chunk_id"),
          expr(s"CAST(array_cosine_similarity(emb, $qArr) AS FLOAT)").as("score"))
        .orderBy(col("score").desc, col("doc_id"), col("chunk_id"))
        .limit(5)
    }),

    // A8-A11 + A20-A21 end-to-end: corpus → differential indexer →
    // embedding join → README.md:318-333 similarity query through the
    // engine. Hash-checked: the oracle replays the feature-hash encoder
    // itself in SQL (see the q_fm_semantic entry in oracleSql below).
    "q_fm_semantic" -> ((s, d) => {
      val eng = SemanticEngines.get(s, d)
      eng.query("**/*.md",
        """SELECT path,
          |       CAST(array_cosine_similarity(embedding, embed('spark table scan query')) AS FLOAT) AS score
          |FROM files WHERE embedding IS NOT NULL
          |ORDER BY score DESC, path LIMIT 10""".stripMargin).results
    })
  )

  /** Symmetric int8 quantization columns: `scale` (double, max|x|/127)
    * and `qv` (array<int>, round-half-up of x/scale; all-zero vectors
    * quantize to zeros). Deterministic: max/abs are order-independent,
    * each element's divide-floor chain is exact IEEE double arithmetic.
    */
  private def quantized(e: DataFrame): DataFrame = e
    .withColumn("scale",
      expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE)))) / 127"))
    .withColumn("qv",
      expr("CASE WHEN scale = 0 THEN transform(embedding, x -> 0) " +
        "ELSE transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5d) AS INT)) END"))

  /** DuckDB replay of the LSH pipeline. The seeded plane matrix is inlined
    * as list literals at oracle-build time (Double.toString round-trips
    * through DuckDB's correctly-rounding parser), and each projection is
    * the same sequential float→double dot product as
    * [[Similarity.signature]], so the sign bits — and therefore buckets,
    * candidates, and the re-ranked top-k — are bit-identical. Emits CTEs
    * ending in `lsh_top(qid, vec_id, sim)` (top-k applied) plus
    * `qv(qid, qv)` for reuse.
    */
  /** Sig + band CTEs shared by every LSH oracle: `sigs(vec_id, sig)` and
    * `lbands(vec_id, b, bucket)` replaying [[graft.ops.LshOps.signature]]
    * with the plane matrix inlined.
    */
  private def lshSigOracleCtes: String = {
    // the full 48-plane matrix (4 bands × 12 max bits) from the single
    // seeded stream — plane j is identical whatever the adaptive width,
    // so the nb-gated sum reproduces the engine's shorter signatures
    // bit-for-bit
    val planes = Similarity.hyperplanes(LshBands * 12, LshDim, seed = LshSeed)
    // the exact integer ladder of lshBandBitsFor as a CASE — no
    // floating log2 on either side
    val ladder = (4 until 12).map(b =>
      s"WHEN COUNT(*) <= ${LshBandTarget << b} THEN $b").mkString(" ")
    val bitTerms = planes.zipWithIndex.map { case (p, j) =>
      val lst = p.mkString("[", ", ", "]")
      val term =
        s"(CASE WHEN list_aggregate(list_transform(range(1, ${LshDim + 1}), " +
          s"i -> CAST(embedding[i] AS DOUBLE) * list_extract($lst, i)), 'sum') >= 0 " +
          s"THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
      // planes beyond the adaptive width contribute nothing (j < 16 is
      // always active: bits >= 4)
      if (j < LshBands * 4) term
      else s"(CASE WHEN $j < $LshBands * (SELECT bits FROM nb) THEN $term ELSE 0 END)"
    }.mkString("\n      + ")
    s"""nb AS (SELECT CASE $ladder ELSE 12 END AS bits FROM embeddings),
       |sigs AS (SELECT vec_id, ($bitTerms) AS sig FROM embeddings),
       |lbands AS (
       |  SELECT vec_id, b,
       |    (sig >> (CAST(b AS INT) * (SELECT bits FROM nb)))
       |      & ((CAST(1 AS BIGINT) << (SELECT bits FROM nb)) - 1) AS bucket
       |  FROM sigs CROSS JOIN (SELECT UNNEST(range(0, $LshBands)) AS b) bs)""".stripMargin
  }

  private def lshOracleCtes(k: Int): String = {
    val cos = oracleCos("e.embedding", "q.qv")
    s"""$lshSigOracleCtes,
       |lq AS (SELECT vec_id AS qid, b, bucket FROM lbands WHERE vec_id < 8),
       |lcand AS (
       |  SELECT DISTINCT q.qid, v.vec_id
       |  FROM lbands v JOIN lq q ON v.b = q.b AND v.bucket = q.bucket
       |  WHERE v.vec_id <> q.qid),
       |qv AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
       |lscored AS (
       |  SELECT c.qid, c.vec_id, CAST($cos AS REAL) AS sim
       |  FROM lcand c JOIN embeddings e ON c.vec_id = e.vec_id
       |               JOIN qv q ON c.qid = q.qid),
       |lsh_top AS (
       |  SELECT qid, vec_id, sim FROM (
       |    SELECT qid, vec_id, sim,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
       |    FROM lscored) x WHERE rn <= $k)""".stripMargin
  }

  /** DuckDB replay of [[ivfCentroids]]: unrolled Lloyd iterations as
    * CTEs — `c0` is the seed quantizer (lowest vec_ids), each round
    * re-assigns by double-cosine argmax (cid tie-break, identical to the
    * Spark side's minBy) and rebuilds centroids as per-(cell, pos) means
    * cast to REAL, reassembled into vectors with an ordered list
    * aggregate. Empty cells COALESCE to the previous round's centroid.
    * Ends with `c{iters}(cid, cv)`.
    */
  private[queries] def ivfOracleCtes(iters: Int): String = {
    val sb = new StringBuilder
    // cell count mirrors ivfCellCount exactly: GREATEST(16, LEAST(cap, n // target))
    sb ++= "c0 AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings " +
      s"WHERE vec_id < (SELECT GREATEST(16, LEAST($IvfCellCap, COUNT(*) // $IvfCellTarget)) FROM embeddings))"
    for (t <- 1 to iters) {
      val cos = oracleCos("e.embedding", "c.cv")
      sb ++= s""",
         |a$t AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT e.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $cos DESC, c.cid) AS rn
         |    FROM embeddings e, c${t - 1} c) x WHERE rn = 1),
         |m$t AS (
         |  SELECT a.cell AS cid, p.pos,
         |    CAST(SUM(CAST(e.embedding[p.pos + 1] AS DOUBLE)) / COUNT(*) AS REAL) AS mv
         |  FROM a$t a JOIN embeddings e USING (vec_id)
         |       CROSS JOIN (SELECT UNNEST(range(0, $LshDim)) AS pos) p
         |  GROUP BY a.cell, p.pos),
         |cl$t AS (SELECT cid, list(mv ORDER BY pos) AS cv FROM m$t GROUP BY cid),
         |c$t AS (SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
         |        FROM c${t - 1} p LEFT JOIN cl$t n USING (cid))""".stripMargin
    }
    sb.toString
  }

  /** Squared L2 between two SubDim-element DuckDB lists as an ascending
    * fixed-order fold — the same sequential double arithmetic as
    * [[graft.ops.PqOps.codes]] and the driver-side ADC table builder.
    */
  private def pqOracleD2(v: String, c: String): String =
    s"list_aggregate(list_transform(range(1, ${PqSubDim + 1}), " +
      s"i -> (CAST($v[i] AS DOUBLE) - $c[i]) * (CAST($v[i] AS DOUBLE) - $c[i])), 'sum')"

  /** DuckDB replay of [[pqCodebook]]: sub-vector slices, seed codebook
    * (codes = dense 0-based rank of the PqK lowest vec_ids, mirroring
    * the Scala seed array index), one Lloyd round of squared-L2 argmin
    * assignment + per-(m, code, dim) means cast to REAL. Ends with
    * `cb$PqIters(m, code, cv)`.
    */
  private def pqOracleCtes: String = {
    val sb = new StringBuilder
    sb ++= s"""sub AS (SELECT UNNEST(range(0, $PqM)) AS m),
       |sv AS (SELECT vec_id, m,
       |         embedding[(m * $PqSubDim + 1):(m * $PqSubDim + $PqSubDim)] AS v
       |       FROM embeddings, sub),
       |cb0 AS (SELECT m,
       |          CAST(ROW_NUMBER() OVER (PARTITION BY m ORDER BY vec_id) - 1 AS INT) AS code,
       |          v AS cv
       |        FROM sv WHERE vec_id < $PqK)""".stripMargin
    for (t <- 1 to PqIters) {
      val d2 = pqOracleD2("s.v", "c.cv")
      sb ++= s""",
         |a$t AS (SELECT vec_id, m, code FROM (
         |    SELECT s.vec_id, s.m, c.code,
         |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY $d2, c.code) AS rn
         |    FROM sv s JOIN cb${t - 1} c USING (m)) x WHERE rn = 1),
         |m$t AS (SELECT a.m, a.code, p.sp,
         |          CAST(SUM(CAST(s.v[p.sp + 1] AS DOUBLE)) / COUNT(*) AS REAL) AS mv
         |        FROM a$t a JOIN sv s ON a.vec_id = s.vec_id AND a.m = s.m
         |             CROSS JOIN (SELECT UNNEST(range(0, $PqSubDim)) AS sp) p
         |        GROUP BY a.m, a.code, p.sp),
         |cl$t AS (SELECT m, code, list(mv ORDER BY sp) AS cv FROM m$t GROUP BY m, code),
         |cb$t AS (SELECT p.m, p.code, COALESCE(n.cv, p.cv) AS cv
         |         FROM cb${t - 1} p LEFT JOIN cl$t n ON p.m = n.m AND p.code = n.code)""".stripMargin
    }
    sb.toString
  }

  /** Shared CTEs replaying [[quantized]] in DuckDB: `qn(vec_id, scale,
    * qv, embedding)` — identical max/abs scale and divide-floor chain.
    */
  private val quantOracleCtes: String =
    """qs AS (SELECT vec_id, embedding,
      |    list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') / 127 AS scale
      |  FROM embeddings),
      |qn AS (SELECT vec_id, scale, embedding,
      |    CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
      |         ELSE list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INT))
      |    END AS qv
      |  FROM qs)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_embed_project" -> {
      val planes = Similarity.hyperplanes(ProjDim, LshDim, seed = ProjSeed)
      val vals = planes.map { p =>
        val lst = p.mkString("[", ", ", "]")
        s"CAST(list_aggregate(list_transform(range(1, ${LshDim + 1}), " +
          s"i -> CAST(embedding[i] AS DOUBLE) * list_extract($lst, i)), 'sum') AS REAL)"
      }
      val posList = (0 until ProjDim).mkString("[", ", ", "]")
      // Two parallel UNNESTs in one SELECT zip positionally in DuckDB.
      s"""SELECT vec_id, UNNEST($posList) AS pos,
         |  UNNEST([${vals.mkString(",\n  ")}]) AS val
         |FROM embeddings ORDER BY vec_id, pos""".stripMargin
    },

    "q_embed_quantize" ->
      s"""WITH $quantOracleCtes
         |SELECT vec_id, scale,
         |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS qsum,
         |  CAST(list_aggregate(list_transform(range(1, 65),
         |    i -> abs(qv[i] * scale - CAST(embedding[i] AS DOUBLE))), 'sum') / 64 AS REAL) AS mae
         |FROM qn ORDER BY vec_id""".stripMargin,

    "q_ann_quantized" ->
      s"""WITH $quantOracleCtes,
         |n AS (SELECT vec_id, qv,
         |    CAST(list_aggregate(list_transform(range(1, 65),
         |      i -> CAST(qv[i] AS BIGINT) * qv[i]), 'sum') AS BIGINT) AS nrm
         |  FROM qn),
         |p AS (SELECT q.vec_id AS qid, e.vec_id,
         |    CAST(CAST(list_aggregate(list_transform(range(1, 65),
         |        i -> CAST(e.qv[i] AS BIGINT) * q.qv[i]), 'sum') AS BIGINT)
         |      / (sqrt(CAST(e.nrm AS DOUBLE)) * sqrt(CAST(q.nrm AS DOUBLE))) AS REAL) AS sim
         |  FROM n e, n q
         |  WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id
         |    AND e.nrm > 0 AND q.nrm > 0)
         |SELECT qid, vec_id, sim FROM (
         |  SELECT qid, vec_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
         |  FROM p) x WHERE rn <= 5
         |ORDER BY qid, sim DESC, vec_id""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH ${lshOracleCtes(5)}
         |SELECT qid, vec_id, sim FROM lsh_top
         |ORDER BY qid, sim DESC, vec_id""".stripMargin,

    "q_ann_incremental" -> {
      val cos = oracleCos("e.embedding", "q.qv")
      s"""WITH $lshSigOracleCtes,
         |bq AS (SELECT vec_id AS qid, b, bucket FROM lbands
         |       WHERE vec_id % $AnnIncrMod = $AnnIncrRem),
         |bcand AS (
         |  SELECT DISTINCT q.qid, v.vec_id
         |  FROM lbands v JOIN bq q ON v.b = q.b AND v.bucket = q.bucket
         |  WHERE v.vec_id % $AnnIncrMod <> $AnnIncrRem),
         |qv AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |       WHERE vec_id % $AnnIncrMod = $AnnIncrRem),
         |scored AS (
         |  SELECT c.qid, c.vec_id, CAST($cos AS REAL) AS sim
         |  FROM bcand c JOIN embeddings e ON c.vec_id = e.vec_id
         |               JOIN qv q ON c.qid = q.qid)
         |SELECT qid, vec_id, sim FROM (
         |  SELECT qid, vec_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
         |  FROM scored) x WHERE rn <= 3
         |ORDER BY qid, sim DESC, vec_id""".stripMargin
    },

    "q_ann_lsh_recall" -> {
      val cos = oracleCos("e.embedding", "q.qv")
      s"""WITH ${lshOracleCtes(5)},
         |p AS (
         |  SELECT q.qid, e.vec_id, CAST($cos AS REAL) AS sim
         |  FROM embeddings e, qv q WHERE e.vec_id <> q.qid),
         |ex AS (SELECT qid, vec_id FROM (
         |         SELECT qid, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
         |         FROM p) x WHERE rn <= 5),
         |per AS (
         |  SELECT ex.qid, COUNT(*) AS n_exact, COUNT(l.vec_id) AS hits
         |  FROM ex LEFT JOIN lsh_top l
         |    ON ex.qid = l.qid AND ex.vec_id = l.vec_id
         |  GROUP BY ex.qid)
         |SELECT qid, 5 AS k, hits,
         |       CAST(hits AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall
         |FROM per ORDER BY qid""".stripMargin
    },

    "q_cosine_topk" -> {
      val cos = oracleCos("e.embedding", "q.qv")
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
         |p AS (
         |  SELECT q.qid, e.vec_id, CAST($cos AS REAL) AS sim
         |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id, sim,
         |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
         |      FROM p)
         |SELECT qid, vec_id, sim FROM r WHERE rn <= 5
         |ORDER BY qid, sim DESC, vec_id""".stripMargin
    },
    "q_embed_neardup" -> {
      val cos = oracleCos("a.embedding", "b.embedding")
      s"""WITH $lshSigOracleCtes,
         |ncand AS (
         |  SELECT DISTINCT x.vec_id AS ia, y.vec_id AS ib
         |  FROM lbands x JOIN lbands y
         |    ON x.b = y.b AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |SELECT c.ia, c.ib, CAST($cos AS REAL) AS sim
         |FROM ncand c
         |  JOIN embeddings a ON c.ia = a.vec_id
         |  JOIN embeddings b ON c.ib = b.vec_id
         |WHERE $cos >= 0.35
         |ORDER BY ia, ib""".stripMargin
    },

    "q_embed_centroids" ->
      """WITH e AS (SELECT label, UNNEST(range(0, 64)) AS pos, embedding FROM embeddings)
        |SELECT label, CAST(pos AS INT) AS pos,
        |  CAST(SUM(CAST(embedding[pos + 1] AS DOUBLE)) / COUNT(*) AS REAL) AS mean_v
        |FROM e GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "q_ann_ivf" -> {
      val cos = oracleCos("e.embedding", "c.cv")
      val qcos = oracleCos("q.qv", "c.cv")
      val rcos = oracleCos("e.embedding", "q.qv")
      s"""WITH ${ivfOracleCtes(IvfIters)},
         |c AS (SELECT cid, cv FROM c$IvfIters),
         |assign AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT e.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $cos DESC, c.cid) AS rn
         |    FROM embeddings e, c) x WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
         |probe AS (
         |  SELECT qid, cid AS cell FROM (
         |    SELECT q.qid, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY $qcos DESC, c.cid) AS rn
         |    FROM q, c) x WHERE rn <= 4),
         |cand AS (
         |  SELECT DISTINCT p.qid, a.vec_id
         |  FROM probe p JOIN assign a ON p.cell = a.cell),
         |scored AS (
         |  SELECT cand.qid, cand.vec_id, CAST($rcos AS REAL) AS sim
         |  FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id
         |            JOIN q ON cand.qid = q.qid
         |  WHERE cand.vec_id <> cand.qid),
         |r AS (SELECT qid, vec_id, sim,
         |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
         |      FROM scored)
         |SELECT qid, vec_id, sim FROM r WHERE rn <= 5
         |ORDER BY qid, sim DESC, vec_id""".stripMargin
    },

    "q_ann_pq" -> {
      val assignD2 = pqOracleD2("s.v", "c.cv")
      val tabD2 = pqOracleD2("q.qv", "c.cv")
      s"""WITH $pqOracleCtes,
         |cb AS (SELECT m, code, cv FROM cb$PqIters),
         |codes AS (SELECT vec_id, m, code FROM (
         |    SELECT s.vec_id, s.m, c.code,
         |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY $assignD2, c.code) AS rn
         |    FROM sv s JOIN cb c USING (m)) x WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, m, v AS qv FROM sv WHERE vec_id < 8),
         |qtab AS (SELECT q.qid, q.m, c.code,
         |    CAST(ROUND($tabD2 * 1000000) AS BIGINT) AS dmicro
         |  FROM q JOIN cb c ON q.m = c.m),
         |adc AS (SELECT t.qid, c.vec_id, CAST(SUM(t.dmicro) AS BIGINT) AS d_adc
         |        FROM codes c JOIN qtab t ON t.m = c.m AND t.code = c.code
         |        WHERE c.vec_id <> t.qid
         |        GROUP BY t.qid, c.vec_id),
         |r AS (SELECT qid, vec_id, d_adc,
         |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d_adc, vec_id) AS rn
         |      FROM adc)
         |SELECT qid, vec_id, d_adc FROM r WHERE rn <= 5
         |ORDER BY qid, d_adc, vec_id""".stripMargin
    },

    // Quantizer training + assignment + within-cell pairwise, then the
    // components as UNROLLED pointer-jumping min-label stages — the same
    // (own label, neighbors' labels, label's label) -> MIN update
    // ConnectedComponents.labelPropagate runs, for the same maxIter cap.
    // The near-dup graph here is a LONG CHAIN (the synthetic embeddings
    // drift by id), so a naive recursive transitive closure would run
    // ~diameter iterations and materialize all-pairs reach — it spilled
    // tens of GB at sf0.1. Pointer jumping converges in ~log(diameter)
    // and each stage is three node/edge-sized joins.
    "q_semdedup" -> {
      val cos = oracleCos("a.embedding", "b.embedding")
      val asgCos = oracleCos("e.embedding", "c.cv")
      val maxIter = 25 // = labelPropagate's cap; idempotent past convergence
      val stages = (1 to maxIter).map { t =>
        s"""l$t AS MATERIALIZED (SELECT node, MIN(label) AS label FROM (
           |    SELECT node, label FROM l${t - 1}
           |    UNION ALL
           |    SELECT e.a AS node, l.label FROM edges e
           |      JOIN l${t - 1} l ON l.node = e.b
           |    UNION ALL
           |    SELECT l1.node, l2.label FROM l${t - 1} l1
           |      JOIN l${t - 1} l2 ON l1.label = l2.node
           |  ) GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${ivfOracleCtes(IvfIters)},
         |asg AS MATERIALIZED (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cid AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY $asgCos DESC, c.cid) AS rn
         |    FROM embeddings e, c$IvfIters c) x WHERE rn = 1),
         |av AS MATERIALIZED (SELECT e.vec_id, e.embedding, asg.cell
         |       FROM embeddings e JOIN asg ON asg.vec_id = e.vec_id),
         |p AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib
         |  FROM av a JOIN av b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE $cos >= $SemDedupSim),
         |edges AS MATERIALIZED (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
         |l0 AS MATERIALIZED (SELECT a AS node, a AS label FROM edges GROUP BY a),
         |$stages
         |SELECT l.node AS vec_id, l.label AS keeper, asg.cell
         |FROM l$maxIter l JOIN asg ON asg.vec_id = l.node
         |WHERE l.label < l.node
         |ORDER BY vec_id""".stripMargin
    },

    // Same quantizer replay as q_semdedup; within-cell pairs ranked on
    // the integer micro-grid with the (sim DESC, nid) tie-break the
    // bounded aggregate's struct sort key encodes.
    "q_knn_graph" -> {
      val cos = oracleCos("a.embedding", "b.embedding")
      val asgCos = oracleCos("e.embedding", "c.cv")
      s"""WITH ${ivfOracleCtes(IvfIters)},
         |asg AS (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cid AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY $asgCos DESC, c.cid) AS rn
         |    FROM embeddings e, c$IvfIters c) x WHERE rn = 1),
         |av AS (SELECT e.vec_id, e.embedding, asg.cell
         |       FROM embeddings e JOIN asg ON asg.vec_id = e.vec_id),
         |p AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
         |    CAST(ROUND(CAST(($cos) AS REAL) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS sim
         |  FROM av a JOIN av b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
         |r AS (SELECT qid, nid, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
         |  FROM p)
         |SELECT qid, nid, sim AS sim_micro FROM r WHERE rn <= $KnnK
         |ORDER BY qid, sim_micro DESC, nid""".stripMargin
    },

    // Same quantizer replay as q_semdedup; the batch/corpus split and the
    // top-1 window mirror the Spark bounded aggregate's tie-break.
    "q_semdedup_incremental" -> {
      val cos = oracleCos("b.embedding", "c.embedding")
      val asgCos = oracleCos("e.embedding", "c.cv")
      s"""WITH ${ivfOracleCtes(IvfIters)},
         |asg AS (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cid AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY $asgCos DESC, c.cid) AS rn
         |    FROM embeddings e, c$IvfIters c) x WHERE rn = 1),
         |av AS (SELECT e.vec_id, e.embedding, asg.cell
         |       FROM embeddings e JOIN asg ON asg.vec_id = e.vec_id),
         |scored AS (SELECT b.vec_id, b.cell, c.vec_id AS match_id,
         |    $cos AS sim_d,
         |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
         |      ORDER BY $cos DESC, c.vec_id) AS rn
         |  FROM av b JOIN av c ON b.cell = c.cell
         |  WHERE b.vec_id % $AnnIncrMod = $AnnIncrRem
         |    AND c.vec_id % $AnnIncrMod <> $AnnIncrRem)
         |SELECT vec_id, cell, match_id, CAST(sim_d AS REAL) AS sim,
         |  sim_d >= $SemDedupSim AS dup
         |FROM scored WHERE rn = 1 ORDER BY vec_id""".stripMargin
    },

    // Same quantizer replay; own-centroid cosine on the micro grid,
    // bottom-OutlierK per cell with the vec_id tie-break mirroring the
    // bounded aggregate's struct order.
    "q_embed_outliers" -> {
      val asgCos = oracleCos("e.embedding", "c.cv")
      val ownCos = oracleCos("e.embedding", "c.cv")
      s"""WITH ${ivfOracleCtes(IvfIters)},
         |asg AS MATERIALIZED (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cid AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY $asgCos DESC, c.cid) AS rn
         |    FROM embeddings e, c$IvfIters c) x WHERE rn = 1),
         |sc AS (SELECT a.cell, e.vec_id,
         |    CAST(ROUND(CAST(($ownCos) AS REAL) * CAST(1000000 AS DOUBLE)) AS BIGINT)
         |      AS own_cos_micro
         |  FROM embeddings e
         |  JOIN asg a ON a.vec_id = e.vec_id
         |  JOIN c$IvfIters c ON c.cid = a.cell),
         |r AS (SELECT cell, vec_id, own_cos_micro,
         |    ROW_NUMBER() OVER (PARTITION BY cell
         |      ORDER BY own_cos_micro, vec_id) AS rank
         |  FROM sc)
         |SELECT cell, rank, vec_id, own_cos_micro
         |FROM r WHERE rank <= $OutlierK ORDER BY cell, rank""".stripMargin
    },

    // Unrolled greedy MMR: step k's CTE cross-joins the k-1 winner CTEs,
    // recomputes each candidate's max-similarity-to-picked on the same
    // micro grid, and takes the top scorer with the id tie-break.
    "q_mmr_rerank" -> {
      def mc(a: String, b: String) =
        s"CAST(ROUND(CAST(${oracleCos(a, b)} AS REAL) * CAST(1000000 AS DOUBLE)) AS BIGINT)"
      val ctes = new StringBuilder
      ctes ++= s"""qvv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cand AS (SELECT e.vec_id, e.embedding, ${mc("e.embedding", "q.qv")} AS rel
         |         FROM embeddings e CROSS JOIN qvv q WHERE e.vec_id > 0)""".stripMargin
      for (k <- 1 to MmrK) {
        val prev = (1 until k).map(j => s"s$j")
        val msExpr =
          if (prev.isEmpty) "CAST(0 AS BIGINT)"
          else if (prev.size == 1) mc("c.embedding", "s1.embedding")
          else "GREATEST(" +
            prev.map(p => mc("c.embedding", s"$p.embedding")).mkString(", ") + ")"
        val from = "cand c" + prev.map(p => s" CROSS JOIN $p").mkString
        val excl = if (prev.isEmpty) ""
          else "\n  WHERE c.vec_id NOT IN (" +
            prev.map(p => s"$p.vec_id").mkString(", ") + ")"
        ctes ++= s""",
           |s$k AS (SELECT c.vec_id, c.embedding, c.rel, $msExpr AS ms
           |  FROM $from$excl
           |  ORDER BY 7 * c.rel - 3 * ($msExpr) DESC, c.vec_id LIMIT 1)""".stripMargin
      }
      val out = (1 to MmrK).map(k =>
        s"SELECT $k AS step, vec_id, rel AS rel_micro, ms AS maxsim_micro, " +
          s"7 * rel - 3 * ms AS score_micro FROM s$k").mkString("\nUNION ALL ")
      s"""WITH ${ctes.toString},
         |outp AS ($out)
         |SELECT * FROM outp ORDER BY step""".stripMargin
    },

    // RAG retrieval oracle: replays chunking (the q_chunk_text window
    // slices), the feature-hash encoder per CHUNK (same CTE chain as
    // q_fm_semantic, keyed by (doc_id, chunk_id)), and the top-5 cosine
    // ranking against the inlined query vector.
    "q_rag_retrieve" -> {
      val dim = Embed.DefaultDim
      val q = Embed.encode(RagQueryText, dim)
      var qn = 0.0
      q.foreach(x => qn += x.toDouble * x.toDouble)
      val qnorm = math.sqrt(qn)
      val vals = q.zipWithIndex.collect {
        case (f, b) if f != 0.0f => s"($b, CAST('$f' AS REAL))"
      }.mkString(", ")
      val max = RagChunkMax
      val stride = RagChunkMax - RagChunkOverlap
      s"""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws,
         |             len(string_split(lower(text), ' ')) AS n FROM documents),
         |c0 AS (SELECT doc_id, ws, n,
         |         CASE WHEN n <= $max THEN 1
         |              ELSE 1 + CAST(ceil(CAST(n - $max AS DOUBLE) / $stride) AS INT) END AS nc
         |       FROM w),
         |ch AS (SELECT doc_id, UNNEST(range(0, nc)) AS chunk_id, ws, n FROM c0),
         |c AS (SELECT doc_id, chunk_id,
         |        ws[(chunk_id * $stride + 1):(chunk_id * $stride + least($max, n - chunk_id * $stride))] AS cs
         |      FROM ch),
         |toks AS (
         |  SELECT doc_id, chunk_id, UNNEST(cs) AS tok FROM c
         |  UNION ALL
         |  SELECT doc_id, chunk_id, UNNEST(list_transform(range(1, len(cs)),
         |    i -> cs[i] || ' ' || cs[i + 1])) AS tok FROM c),
         |tb AS (SELECT doc_id, chunk_id, CAST((h >> 1) % $dim AS INT) AS bucket,
         |         CASE WHEN (h & 1) = 0 THEN 1.0 ELSE -1.0 END AS sign
         |       FROM (SELECT doc_id, chunk_id,
         |               CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
         |             FROM toks)),
         |acc AS (SELECT doc_id, chunk_id, bucket, SUM(sign) AS s FROM tb GROUP BY 1, 2, 3),
         |nrm AS (SELECT doc_id, chunk_id, 1.0 / sqrt(SUM(s * s)) AS inv
         |        FROM acc GROUP BY 1, 2),
         |f AS (SELECT acc.doc_id, acc.chunk_id, bucket, CAST(s * inv AS REAL) AS fv
         |      FROM acc JOIN nrm USING (doc_id, chunk_id)),
         |qv AS (SELECT * FROM (VALUES $vals) t(bucket, qf)),
         |dp AS (SELECT f.doc_id, f.chunk_id, SUM(CAST(fv AS DOUBLE) * CAST(qf AS DOUBLE)) AS dot
         |       FROM f JOIN qv USING (bucket) GROUP BY 1, 2),
         |nn AS (SELECT doc_id, chunk_id, SUM(CAST(fv AS DOUBLE) * CAST(fv AS DOUBLE)) AS n2
         |       FROM f GROUP BY 1, 2),
         |sc AS (SELECT nn.doc_id, nn.chunk_id,
         |         CAST(COALESCE(dot, 0.0) / (sqrt(n2) * $qnorm) AS REAL) AS score
         |       FROM nn LEFT JOIN dp USING (doc_id, chunk_id))
         |SELECT doc_id, chunk_id, score FROM sc
         |ORDER BY score DESC, doc_id, chunk_id LIMIT 5""".stripMargin
    },

    // The embed() e2e oracle: replays the deterministic feature-hashing
    // encoder in SQL — 60-bit md5 token hashes into bucket/sign sums,
    // the exact float normalization (CAST(s * (1/sqrt(sum s^2)) AS REAL)
    // reproduces the JVM's (x * inv).toFloat rounding), and the cosine
    // against the query vector whose nonzero components are inlined from
    // the Scala encoder at oracle-build time. Final scores cast to REAL
    // absorb double accumulation-order noise.
    "q_fm_semantic" -> {
      val dim = Embed.DefaultDim
      val q = Embed.encode("spark table scan query", dim)
      var qn = 0.0
      q.foreach(x => qn += x.toDouble * x.toDouble)
      val qnorm = math.sqrt(qn)
      val vals = q.zipWithIndex.collect {
        case (f, b) if f != 0.0f => s"($b, CAST('$f' AS REAL))"
      }.mkString(", ")
      s"""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
         |toks AS (
         |  SELECT doc_id, UNNEST(ws) AS tok FROM w
         |  UNION ALL
         |  SELECT doc_id, UNNEST(list_transform(range(1, len(ws)),
         |    i -> ws[i] || ' ' || ws[i + 1])) AS tok FROM w),
         |tb AS (SELECT doc_id, CAST((h >> 1) % $dim AS INT) AS bucket,
         |         CASE WHEN (h & 1) = 0 THEN 1.0 ELSE -1.0 END AS sign
         |       FROM (SELECT doc_id,
         |               CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
         |             FROM toks)),
         |acc AS (SELECT doc_id, bucket, SUM(sign) AS s FROM tb GROUP BY 1, 2),
         |nrm AS (SELECT doc_id, 1.0 / sqrt(SUM(s * s)) AS inv FROM acc GROUP BY 1),
         |f AS (SELECT acc.doc_id, bucket, CAST(s * inv AS REAL) AS fv
         |      FROM acc JOIN nrm USING (doc_id)),
         |qv AS (SELECT * FROM (VALUES $vals) t(bucket, qf)),
         |dp AS (SELECT f.doc_id, SUM(CAST(fv AS DOUBLE) * CAST(qf AS DOUBLE)) AS dot
         |       FROM f JOIN qv USING (bucket) GROUP BY 1),
         |nn AS (SELECT doc_id, SUM(CAST(fv AS DOUBLE) * CAST(fv AS DOUBLE)) AS n2
         |       FROM f GROUP BY 1),
         |sc AS (SELECT nn.doc_id,
         |         CAST(COALESCE(dot, 0.0) / (sqrt(n2) * $qnorm) AS REAL) AS score
         |       FROM nn LEFT JOIN dp USING (doc_id))
         |SELECT source || '/doc_' || lpad(CAST(d.doc_id AS VARCHAR), 5, '0') || '.md' AS path,
         |       score
         |FROM sc JOIN documents d ON sc.doc_id = d.doc_id
         |ORDER BY score DESC, path LIMIT 10""".stripMargin
    }
  )
}

/** Deterministic random-hyperplane LSH helpers. */
object Similarity {
  /** Sequential double-precision cosine (matches CosineOps). */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Seeded hyperplanes: nBits x dim gaussian-ish components. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-projection signature packed into an Int (bit j = plane j) —
    * delegates to the [[graft.ops.LshOps]] kernel the Catalyst expression
    * runs, so specs and oracle-build helpers stay bit-identical with the
    * executor path by construction.
    */
  def signature(v: Array[Float], planes: Array[Array[Double]]): Long =
    graft.ops.LshOps.signature(
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(v),
      planes)
}

/** Per-sfDir semantic engines: corpus + cache + synchronously-awaited
  * indexer, reused across queries and bench iterations.
  */
object SemanticEngines {
  private val engines = graft.QueryCaches.register(scala.collection.concurrent.TrieMap.empty[(Int, String), QueryEngine])

  def get(s: SparkSession, d: String): QueryEngine =
    graft.Tables.memo(engines, (graft.Tables.sessionKey(s), d))({
      val base = FixtureCorpus.ensure(s, d)
      val slug = d.replaceAll("[^A-Za-z0-9.]+", "_")
      // model name doubles as the encoder version: bumping it invalidates
      // caches built by older encoder revisions (model-change semantics).
      val settings = Settings(
        base.toString, enableSemantic = true, "graft-hash-encoder-v2",
        Some(s"/tmp/graft_sem_cache_$slug"))
      val ctx = new SemanticContext(s, settings)
      ctx.indexer.start()
      ctx.indexer.await(300000)
      new QueryEngine(s, settings, Some(ctx))
    })
}
