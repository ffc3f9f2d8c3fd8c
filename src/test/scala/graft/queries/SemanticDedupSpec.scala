package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Driver-side references for the semantic-dedup and MMR operators: the
  * cluster-then-pairwise dedup is re-derived with a plain union-find
  * over exact cosines (using the same trained centroids, which are
  * themselves pinned by the q_ann_ivf oracle), and the greedy MMR
  * selection is replayed step by step on the identical micro-int grid.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private lazy val vecs: Map[Long, Array[Float]] =
    Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cos(a: Array[Float], b: Array[Float]): Double =
    Similarity.cosine(a, b)

  test("q_semdedup matches union-find over within-cell exact cosines") {
    val rows = SparkEntry.queries("q_semdedup")(spark, sf).collect()
    val cents = SimilarityQueries.ivfCentroids(
      spark, sf, SimilarityQueries.IvfIters)
    val cellOf = vecs.map { case (id, v) =>
      id -> cents.map { case (cid, c) => (cos(v, c), cid) }
        .minBy { case (sim, cid) => (-sim, cid) }._2
    }
    val ids = vecs.keys.toSeq.sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    var nPairs = 0
    for {
      i <- ids.indices
      j <- i + 1 until ids.length
      if cellOf(ids(i)) == cellOf(ids(j))
      if cos(vecs(ids(i)), vecs(ids(j))) >= SimilarityQueries.SemDedupSim
    } { union(ids(i), ids(j)); nPairs += 1 }
    assert(nPairs > 0, "threshold fires on nothing at this SF")
    val want = ids.flatMap { id =>
      val root = find(id)
      if (root < id) Some((id, root, cellOf(id))) else None
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == want)
  }

  test("q_semdedup_incremental flags exactly the batch vectors with a same-cell match") {
    val rows = SparkEntry.queries("q_semdedup_incremental")(spark, sf).collect()
    val cents = SimilarityQueries.ivfCentroids(
      spark, sf, SimilarityQueries.IvfIters)
    val cellOf = vecs.map { case (id, v) =>
      id -> cents.map { case (cid, c) => (cos(v, c), cid) }
        .minBy { case (sim, cid) => (-sim, cid) }._2
    }
    val (mod, rem) = (SimilarityQueries.AnnIncrMod, SimilarityQueries.AnnIncrRem)
    val corpus = vecs.keys.filter(_ % mod != rem).toSeq.sorted
    val expected = vecs.keys.filter(_ % mod == rem).toSeq.sorted.flatMap { b =>
      val cands = corpus.filter(c => cellOf(c) == cellOf(b))
      if (cands.isEmpty) None
      else {
        val (m, sim) = cands.map(c => (c, cos(vecs(b), vecs(c))))
          .minBy { case (c, s) => (-s, c) }
        Some((b, cellOf(b), m, sim.toFloat,
          sim >= SimilarityQueries.SemDedupSim))
      }
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getFloat(3), r.getBoolean(4))).toSeq == expected)
    assert(expected.exists(_._5) && expected.exists(!_._5),
      "threshold should split the batch at this SF")
  }

  test("q_mmr_rerank matches a driver-side greedy reference") {
    val rows = SparkEntry.queries("q_mmr_rerank")(spark, sf).collect()
    def micro(x: Double): Long =
      new java.math.BigDecimal(x.toFloat.toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val q = vecs(0L)
    val cand = vecs.keys.filter(_ > 0).toSeq.sorted
    val rel = cand.map(id => id -> micro(cos(vecs(id), q))).toMap
    var selected = Vector.empty[Long]
    val expected = (1 to SimilarityQueries.MmrK).map { k =>
      val best = cand.filterNot(selected.contains).map { id =>
        val ms =
          if (selected.isEmpty) 0L
          else selected.map(s => micro(cos(vecs(id), vecs(s)))).max
        (id, rel(id), ms, 7L * rel(id) - 3L * ms)
      }.minBy { case (id, _, _, score) => (-score, id) }
      selected :+= best._1
      (k, best._1, best._2, best._3, best._4)
    }
    assert(rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == expected)
    // diversity must bite: at least one step's winner is not simply the
    // next-highest-relevance candidate
    val byRel = cand.sortBy(id => (-rel(id), id)).take(SimilarityQueries.MmrK)
    assert(expected.map(_._2) != byRel,
      "MMR degenerated to pure relevance ranking; lambda has no effect")
  }
}
