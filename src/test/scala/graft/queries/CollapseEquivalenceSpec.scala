package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** The r14 exact-duplicate collapses (q_embed_neardup pairs, q_semdedup
  * connected components, q_semdedup_incremental top-1, q_knn_graph
  * top-k club) are execution strategies that must be OUTPUT-INVISIBLE.
  * The driver's oracle gate runs at sf0.01 where embeddings are all
  * distinct, so every duplicate group there has m = 1 and the collapse
  * paths are exercised trivially; this spec re-derives each query with
  * a plain-Scala reference on a DUPLICATE-HEAVY corpus (the adversarial
  * skew synthesizer at k = 16: ~10% of vectors are byte-identical
  * donor-copy clusters) where the collapses actually merge groups.
  * References use Similarity.cosine / Similarity.signature — the same
  * sequential-double kernels the Catalyst expressions run — so the
  * comparison is over identical arithmetic.
  */
class CollapseEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val dest = "/tmp/graft_collapse_spec_x16"
    val d = new java.io.File(dest)
    if (d.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(d)
    }
    graft.ScaleProbe.synthesizeSkew(spark, "/root/testdata/sf0.001", 16, dest)
    dest
  }

  private lazy val vecs: Seq[(Long, Array[Float])] =
    Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
      .sortBy(_._1)

  private def cos(a: Array[Float], b: Array[Float]): Double =
    Similarity.cosine(a, b)

  private lazy val cellOf: Map[Long, Long] = {
    val cents = SimilarityQueries.ivfCentroids(
      spark, dir, SimilarityQueries.IvfIters)
    vecs.map { case (id, v) =>
      id -> cents.map { case (cid, c) => (cos(v, c), cid) }
        .minBy { case (sim, cid) => (-sim, cid) }._2
    }.toMap
  }

  private def assertHasDuplicates(): Unit = {
    val groups = vecs.groupBy(_._2.toSeq).values
    assert(groups.exists(_.size >= 4),
      "corpus must contain identical-vector clusters or the collapse is untested")
  }

  // round-half-away-from-zero to the micro grid, as Spark's round()
  private def micro(c: Double): Long =
    BigDecimal(c.toFloat.toDouble * 1000000.0)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("q_knn_graph (top-k club collapse) == per-member within-cell reference") {
    assertHasDuplicates()
    val prod = SparkEntry.queries("q_knn_graph")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val byId = vecs.toMap
    val want = vecs.map(_._1).flatMap { qid =>
      val cands = vecs.map(_._1)
        .filter(n => n != qid && cellOf(n) == cellOf(qid))
        .map(n => (n, micro(cos(byId(qid), byId(n)))))
        .sortBy { case (n, m) => (-m, n) }
        .take(SimilarityQueries.KnnK)
      cands.map { case (n, m) => (qid, n, m) }
    }
    assert(prod == want)
  }

  test("q_semdedup (rep-level CC + star edges) == member-level union-find") {
    assertHasDuplicates()
    val rows = SparkEntry.queries("q_semdedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ids = vecs.map(_._1)
    val byId = vecs.toMap
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    var merged = 0
    for {
      i <- ids.indices
      j <- i + 1 until ids.length
      if cellOf(ids(i)) == cellOf(ids(j))
      if cos(byId(ids(i)), byId(ids(j))) >= SimilarityQueries.SemDedupSim
    } { union(ids(i), ids(j)); merged += 1 }
    assert(merged > 0)
    val want = ids.flatMap { id =>
      val root = find(id)
      if (root < id) Some((id, root, cellOf(id))) else None
    }
    assert(rows == want)
  }

  test("q_semdedup_incremental (collapsed corpus top-1) == uncollapsed reference") {
    assertHasDuplicates()
    val prod = SparkEntry.queries("q_semdedup_incremental")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getFloat(3), r.getBoolean(4)))
      .toSeq
    val byId = vecs.toMap
    val (batch, corpus) = vecs.map(_._1).partition(
      id => id % SimilarityQueries.AnnIncrMod == SimilarityQueries.AnnIncrRem)
    val want = batch.sorted.flatMap { bid =>
      val cands = corpus.filter(m => cellOf(m) == cellOf(bid))
        .map(m => (m, cos(byId(bid), byId(m))))
      if (cands.isEmpty) None
      else {
        val (mid, sim) = cands.minBy { case (m, s) => (-s, m) }
        Some((bid, cellOf(bid), mid, sim.toFloat,
          sim >= SimilarityQueries.SemDedupSim))
      }
    }
    assert(prod == want)
  }

  // ---- mega-cluster corpus (r15, verdict r14 advice, medium) ----
  // An exact-duplicate cluster LARGER than the hot-shingle cutoff made
  // every one of its own shingles hot under the r14 doc-level df rule,
  // so the cluster — precisely what dedup most needs to find — produced
  // ZERO candidates, and the skew synthesizer's ≤8-sized clusters never
  // exercised the hole. This corpus plants a 1100-identical-doc cluster
  // in a 1201-doc corpus (cutoff = max(1024, 8·⌊√1201⌋) = 1024 < 1100)
  // plus a near-dup VARIANT of the cluster text (its shared shingles
  // were also doc-level-hot — the cross-group path of the collapse) and
  // 50 namespaced near-dup pairs (cold-shingle control group). Shared
  // by the ngram, minhash, simhash, and incremental collapse tests.
  private val megaClusterText = "legal notice all rights reserved by the operator"
  // doc 60 and doc 1201 share one LONGER near-dup of the cluster text:
  // a duplicate group whose member ids INTERLEAVE with the cluster's
  // (60 < 100..1199 < 1201) and whose shingle count (11) differs from
  // the cluster's (6) — the case that exercises the expansion's
  // least/greatest id ordering AND the per-side na/nb swap that
  // asymmetric containment reads (a swap bug is invisible on
  // same-size or non-interleaved groups).
  private val megaLongVariant =
    megaClusterText + " with three extra trailing terms appended"
  private lazy val megaDocs: Seq[(Long, String)] =
    (0 until 50).flatMap { i =>
      Seq((2L * i, s"p${i}a p${i}b p${i}c p${i}d p${i}e p${i}f p${i}g p${i}h"),
        (2L * i + 1, s"p${i}a p${i}b p${i}c p${i}d p${i}e p${i}f p${i}g p${i}z"))
    }.map { case (id, t) => if (id == 60L) (id, megaLongVariant) else (id, t) } ++
    (100 until 1200).map(i => (i.toLong, megaClusterText)) ++
    Seq((1200L, "legal notice all rights reserved by the website"),
      (1201L, megaLongVariant))

  private lazy val megaDir: String = {
    val dir = "/tmp/graft_megacluster_spec"
    val d = new java.io.File(dir)
    if (d.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(d)
    }
    import spark.implicits._
    megaDocs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  /** Portable 60-bit hash: first 15 hex chars of md5, as the engine and
    * oracle compute it (DedupQueries.h60).
    */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def megaShingles(t: String): Set[String] = {
    val w = t.toLowerCase.split(" ")
    if (w.length < 3) Set.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  test("q_dedup_ngram (exact-text collapse) == cutoff-free brute force on a >cutoff cluster") {
    val n = megaDocs.length
    val cutoff = math.max(1024L, 8L * math.floor(math.sqrt(n.toDouble)).toLong)
    assert(1100 > cutoff, "cluster must exceed the cutoff or the hole is untested")

    val prod = SparkEntry.queries("q_dedup_ngram")(spark, megaDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    // cutoff-free brute force over shingle STRINGS (the engine hashes
    // after array_distinct, so distinct counts agree; 60-bit collisions
    // are absent on this vocabulary): on this corpus rep-level df never
    // reaches the cutoff, so the engine must equal the ideal uncutoff
    // semantics exactly.
    val sh = megaDocs.map { case (id, t) => id -> megaShingles(t) }.toMap
    val inverted = scala.collection.mutable.Map.empty[String, List[Long]]
    for ((id, ss) <- megaDocs.map { case (id, t) => (id, sh(id)) }; s <- ss)
      inverted(s) = id :: inverted.getOrElse(s, Nil)
    val candidates = scala.collection.mutable.Set.empty[(Long, Long)]
    for (ids <- inverted.values) {
      val v = ids.sorted.toIndexedSeq
      for (i <- v.indices; j <- i + 1 until v.length)
        candidates += ((v(i), v(j)))
    }
    val want = candidates.toSeq.map { case (a, b) =>
      val (sa, sb) = (sh(a), sh(b))
      val common = (sa & sb).size
      (a, b, common.toDouble / (sa.size + sb.size - common))
    }.filter(_._3 >= 0.5).sortBy { case (a, b, _) => (a, b) }

    assert(want.count { case (a, b, _) => a >= 100 && b <= 1199 } > 600000,
      "the cluster's pair enumeration must dominate the expected output")
    assert(prod.size == want.size)
    assert(prod == want)
  }

  test("rarest-shingle retention finds near-identical pure-boilerplate pairs (r16, flag-gated)") {
    // The documented completeness trade (COVERAGE.md): a pair of
    // DISTINCT texts whose EVERY pairable shared shingle clears the
    // cutoff never shares a cold candidate key. 20 docs share an
    // 11-token boilerplate prefix and differ in ONE trailing token —
    // all 9 shared shingles have df = 20 ≥ cutoff 8, the unique-token
    // shingle has df = 1 — so the cutoff path finds ZERO pairs among
    // them. With retention, every doc's rarest pairable shingle is the
    // same hot key (identical pairable sets) and all 190 pairs emerge
    // with exact scores. Docs 100/101 share a cold df-2 shingle besides
    // the hot prefix: the cold path must score them ONCE with the full
    // hot+cold common count (no duplicate row from the retention union),
    // and their rarest pairable shingle is that COLD one, so they retain
    // nothing — (100, boilerplate-doc) pairs stay unfound even with the
    // flag, the documented heuristic limit.
    val spark2 = spark
    import spark2.implicits._
    val prefix = (1 to 11).map(i => s"t$i").mkString(" ")
    val docs: Seq[(Long, String)] =
      (0 until 20).map(i => (i.toLong, s"$prefix w$i")) ++
        Seq((100L, s"$prefix z1 z2"), (101L, s"$prefix z1 z3"))
    def shingles(t: String): Set[String] = megaShingles(t)
    val sh = docs.flatMap { case (id, t) => shingles(t).map(s => (id, h60(s))) }
      .toDF("doc_id", "sh")
    val cutoff = 8L

    def collect(retain: Boolean): Set[(Long, Long, Long, Long, Long, Double)] =
      DedupQueries.jaccardPairs(sh, cutoff, bigCorpus = false, retainRarest = retain)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))).toSet

    // brute-force reference: every pair sharing >= 1 pairable shingle,
    // exact common/na/nb/jac from the sets themselves
    val shMap = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val dfOf = docs.flatMap { case (_, t) => shingles(t) }
      .groupBy(identity).map { case (s, xs) => s -> xs.size }
    def score(a: Long, b: Long) = {
      val (sa, sb) = (shMap(a), shMap(b))
      val common = (sa & sb).size.toLong
      (a, b, common, sa.size.toLong, sb.size.toLong,
        common.toDouble / (sa.size + sb.size - common))
    }
    val allPairs = for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      shared = shMap(a) & shMap(b) if shared.nonEmpty
    } yield (a, b, shared)
    val coldPairs = allPairs.collect {
      case (a, b, shared) if shared.exists(s => dfOf(s) >= 2 && dfOf(s) < cutoff) =>
        score(a, b)
    }.toSet
    // retention adds pairs whose docs share the SAME retained key: the
    // rarest pairable shingle, retained only when hot
    def retainedKey(id: Long): Option[String] = {
      val pairable = shMap(id).filter(dfOf(_) >= 2)
      if (pairable.isEmpty) None
      else {
        val r = pairable.minBy(s => (dfOf(s), h60(s)))
        if (dfOf(r) >= cutoff) Some(r) else None
      }
    }
    val retainPairs = allPairs.collect {
      case (a, b, _) if retainedKey(a).isDefined && retainedKey(a) == retainedKey(b) =>
        score(a, b)
    }.toSet

    val plain = collect(retain = false)
    assert(plain == coldPairs)
    assert(plain == Set(score(100L, 101L)), "cutoff path: only the cold pair")
    assert(plain.head._3 == 10L, "cold pair's common must include the 9 hot shingles")

    val retained = collect(retain = true)
    assert(retained == (coldPairs ++ retainPairs))
    assert(retained.size == 191, "190 boilerplate pairs + the cold pair")
    assert(retained.count { case (a, b, _, _, _, _) => a < 20 && b < 20 } == 190)
    // the heuristic limit: docs 100/101's rarest pairable shingle is the
    // cold one, so they never pair with the boilerplate cluster
    assert(!retained.exists { case (a, b, _, _, _, _) => a < 20 && b >= 100 })
    // exact scores on a retained pair: common 9, sizes 10, jac 9/11
    assert(retained.contains((0L, 1L, 9L, 10L, 10L, 9.0 / 11.0)))
  }

  test("q_dedup_containment (per-side na/nb through the expansion) == brute force") {
    // the collapse copies rep-level scores onto member pairs, but na/nb
    // are PER-SIDE: when member ids interleave (group {60, 1201} vs the
    // 100..1199 cluster) the least/greatest reordering must swap them.
    // Brute force recomputes every pair's sizes directly from its own
    // shingle sets, so any swap bug shows as transposed cont_a/cont_b.
    val sh = megaDocs.map { case (id, t) => id -> megaShingles(t) }.toMap
    val inverted = scala.collection.mutable.Map.empty[String, List[Long]]
    for ((id, ss) <- megaDocs.map { case (id, t) => (id, sh(id)) }; s <- ss)
      inverted(s) = id :: inverted.getOrElse(s, Nil)
    val candidates = scala.collection.mutable.Set.empty[(Long, Long)]
    for (ids <- inverted.values) {
      val v = ids.sorted.toIndexedSeq
      for (i <- v.indices; j <- i + 1 until v.length)
        candidates += ((v(i), v(j)))
    }
    val want = candidates.toSeq.flatMap { case (a, b) =>
      val (sa, sb) = (sh(a), sh(b))
      val common = (sa & sb).size.toLong
      val (na, nb) = (sa.size.toLong, sb.size.toLong)
      val (ca, cb) = (common * 1000 / na, common * 1000 / nb)
      val missed = common.toDouble / (na + nb - common) < 0.5
      if (math.max(ca, cb) >= 800) Some((a, b, common, na, nb, ca, cb, missed))
      else None
    }.sortBy { case (a, b, _, _, _, _, _, _) => (a, b) }
    val prod = SparkEntry.queries("q_dedup_containment")(spark, megaDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))).toSeq
    // the asymmetric interleaved pairs must exist or the swap is untested
    assert(want.exists { case (a, b, _, na, nb, _, _, _) =>
      b == 1201L && a >= 100L && na != nb })
    assert(prod == want)
  }

  test("q_dedup_minhash (rep-level bands + verify) == doc-level brute force on the mega cluster") {
    val Prime = 2147483647L
    def permA(i: Int): Long = (1103515245L * (i + 1)) % Prime
    def permB(i: Int): Long = (12345L * (i + 1) + 7) % Prime
    val sh = megaDocs.map { case (id, t) => id -> megaShingles(t) }.toMap
    // doc-level signatures exactly as the uncollapsed formulation: 16
    // permutations over h60 % Prime of each doc's distinct shingles
    val sigs: Map[Long, IndexedSeq[Long]] = megaDocs.collect {
      case (id, _) if sh(id).nonEmpty =>
        val h31 = sh(id).map(s => h60(s) % Prime)
        id -> (0 until 16).map(i => h31.map(h => (permA(i) * h + permB(i)) % Prime).min)
    }.toMap
    val bandsOf: Map[Long, IndexedSeq[IndexedSeq[Long]]] =
      sigs.map { case (id, m) => id -> (0 until 4).map(bi => m.slice(bi * 4, bi * 4 + 4)) }
    val ids = sigs.keys.toSeq.sorted
    val candidates = scala.collection.mutable.Set.empty[(Long, Long)]
    for (band <- 0 until 4)
      ids.groupBy(id => bandsOf(id)(band)).values.foreach { bucket =>
        val v = bucket.sorted.toIndexedSeq
        for (i <- v.indices; j <- i + 1 until v.length)
          candidates += ((v(i), v(j)))
      }
    val want = candidates.toSeq.map { case (a, b) =>
      val (sa, sb) = (sh(a), sh(b))
      val common = (sa & sb).size
      (a, b, common.toDouble / (sa.size + sb.size - common))
    }.filter(_._3 >= 0.3).sortBy { case (a, b, _) => (a, b) }
    val prod = SparkEntry.queries("q_dedup_minhash")(spark, megaDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(want.size > 600000, "the cluster must dominate the expected output")
    assert(prod == want)
  }

  test("q_jaccard_prefix (rep-level prefix filter) == threshold brute force on the mega cluster") {
    // prefix pruning is lossless under any consistent order, so the
    // reference needs NO prefix logic at all: the verified output is
    // exactly the pairs at or above J = JacNum/JacDen over non-empty
    // shingle sets — the strongest possible statement of the
    // order-invariance the collapse relies on.
    val sh = megaDocs.map { case (id, t) => id -> megaShingles(t) }.toMap
    val ids = megaDocs.map(_._1).filter(sh(_).nonEmpty).sorted
    val (jn, jd) = (MiningQueries.JacNum, MiningQueries.JacDen)
    val want = (for {
      i <- ids.indices.iterator
      j <- (i + 1 until ids.length).iterator
      (sa, sb) = (sh(ids(i)), sh(ids(j)))
      inter = (sa & sb).size.toLong
      uni = sa.size + sb.size - inter
      if inter * jd >= uni * jn
    } yield (ids(i), ids(j), inter, uni, inter.toDouble / uni))
      .toSeq.sortBy { case (a, b, _, _, _) => (a, b) }
    val prod = SparkEntry.queries("q_jaccard_prefix")(spark, megaDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(want.size > 600000, "the cluster must dominate the expected output")
    assert(prod == want)
  }

  test("q_winnow_crossdup (rep-level fingerprints) == plain-Scala reference on the mega cluster") {
    // the r14 doc-level df <= CrossMaxDf (20) window made a >20-doc
    // identical cluster's own fingerprints "boilerplate" — zero rows
    // for exactly the cluster crossdup should flag. Reference = the
    // r15 semantics stated independently: winnow fingerprints per
    // DISTINCT text (WinnowPropSpec's sliding-min definition), cross
    // pairs count shared fingerprints with distinct-text df in
    // [2, CrossMaxDf], same-text pairs carry the text's full
    // fingerprint count, both thresholded at CrossMinShared.
    val (k, w) = (TextQueries.CrossK, TextQueries.CrossW)
    def winnow(text: String): Set[Long] = {
      val t = text.toLowerCase
      if (t.length < k + w - 1) return Set.empty
      val hs = (0 to t.length - k).map(i => h60(t.substring(i, i + k)))
      hs.sliding(w).map(_.min).toSet
    }
    val byText = megaDocs.groupBy(_._2)
    val repOf = byText.map { case (t, ds) => t -> ds.map(_._1).min }
    val repFps = byText.keys.map(t => repOf(t) -> winnow(t)).toMap
    val members = byText.map { case (t, ds) => repOf(t) -> ds.map(_._1).sorted }
    val dfOf = repFps.values.flatten.groupBy(identity).map { case (fp, xs) => fp -> xs.size }
    def okFps(r: Long): Set[Long] =
      repFps(r).filter(fp => dfOf(fp) >= 2 && dfOf(fp) <= TextQueries.CrossMaxDf)
    val reps = repFps.keys.toSeq.sorted
    val cross = for {
      i <- reps.indices
      j <- i + 1 until reps.length
      shared = (okFps(reps(i)) & okFps(reps(j))).size
      if shared >= TextQueries.CrossMinShared
      a <- members(reps(i)); b <- members(reps(j))
    } yield (math.min(a, b), math.max(a, b), shared.toLong)
    val within = for {
      r <- reps
      if repFps(r).size >= TextQueries.CrossMinShared
      ms = members(r)
      i <- ms.indices; j <- i + 1 until ms.length
    } yield (ms(i), ms(j), repFps(r).size.toLong)
    val want = (cross ++ within).sortBy { case (a, b, _) => (a, b) }
    val prod = SparkEntry.queries("q_winnow_crossdup")(spark, megaDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(want.count { case (a, b, _) => a >= 100 && b <= 1199 } > 600000,
      "the cluster's pairs must dominate — the r14 window dropped ALL of them")
    assert(prod == want)
  }

  test("q_dedup_simhash + q_dedup_incremental (rep-level sigs) == doc-level brute force") {
    // doc-level simhash exactly as the uncollapsed formulation: ±1 bit
    // sums over per-word h60 of every word OCCURRENCE
    def sig(t: String): Long = {
      val sums = new Array[Int](60)
      for (w <- t.toLowerCase.split(" ", -1); h = h60(w); i <- 0 until 60)
        sums(i) += (if (((h >> i) & 1L) == 1L) 1 else -1)
      (0 until 60).map(i => if (sums(i) > 0) 1L << i else 0L).sum
    }
    val sigs = megaDocs.map { case (id, t) => id -> sig(t) }.toMap
    val ids = megaDocs.map(_._1).sorted

    val wantPairs = (for {
      i <- ids.indices.iterator
      j <- (i + 1 until ids.length).iterator
      h = java.lang.Long.bitCount(sigs(ids(i)) ^ sigs(ids(j)))
      if h <= 3
    } yield (ids(i), ids(j), h)).toSeq.sortBy { case (a, b, _) => (a, b) }
    val prodPairs = SparkEntry.queries("q_dedup_simhash")(spark, megaDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(wantPairs.size > 600000, "the cluster must dominate the expected output")
    assert(prodPairs == wantPairs)

    val incrMod = DedupQueries.IncrMod
    val (batch, corpus) = ids.partition(_ % incrMod == 0)
    val wantIncr = batch.sorted.map { a =>
      val matches = corpus.filter(b => java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3)
      (a, matches.size.toLong, matches.sorted.headOption, matches.nonEmpty)
    }
    val prodIncr = SparkEntry.queries("q_dedup_incremental")(spark, megaDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))).toSeq
    assert(prodIncr == wantIncr)
  }

  test("q_embed_neardup (pair-expansion collapse) == uncollapsed band reference") {
    assertHasDuplicates()
    val prod = SparkEntry.queries("q_embed_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getFloat(2))).toSeq
    val byId = vecs.toMap
    // 4 bands (SimilarityQueries.LshBands) x adaptive bits, planes from
    // the same seed stream, signatures through the executor kernel
    val bits = SimilarityQueries.lshBandBitsFor(vecs.length.toLong)
    val planes = Similarity.hyperplanes(4 * bits, 64, seed = 42L)
    val sig = vecs.map { case (id, v) =>
      id -> Similarity.signature(v, planes)
    }.toMap
    val mask = (1L << bits) - 1
    val candidates = scala.collection.mutable.Set.empty[(Long, Long)]
    for (band <- 0 until 4) {
      vecs.map(_._1).groupBy(id => (sig(id) >> (band * bits)) & mask)
        .values.foreach { bucket =>
          val b = bucket.sorted
          for (i <- b.indices; j <- i + 1 until b.length)
            candidates += ((b(i), b(j)))
        }
    }
    val want = candidates.toSeq
      .map { case (ia, ib) => (ia, ib, cos(byId(ia), byId(ib))) }
      .filter(_._3 >= 0.35)
      .map { case (ia, ib, s) => (ia, ib, s.toFloat) }
      .sortBy { case (ia, ib, _) => (ia, ib) }
    assert(prod == want)
  }
}
