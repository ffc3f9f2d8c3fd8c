package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Behavior checks for the mining operators beyond the DuckDB hash gate:
  * every query is re-derived by an independent driver-side reference
  * implementation (plain Scala collections, no Spark, no SQL) so the
  * distributed plans are pinned to the semantics they claim, not merely
  * to cross-engine agreement on the same formulation.
  */
class MiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private lazy val docWords: Map[Long, Array[String]] =
    Tables.load(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" "))
      .toMap

  private def shingleSets: Map[Long, Set[String]] = docWords.map {
    case (id, w) =>
      id -> (if (w.length < 3) Set.empty[String]
             else w.sliding(3).map(_.mkString(" ")).toSet)
  }

  /** Reference BPE trainer: returns the merge trajectory and the final
    * symbolization-frequency table, shared by the merge-table and
    * tokenizer tests.
    */
  private lazy val referenceBpe: (Seq[(String, String, Long)], Map[List[String], Long]) = {
    var syms: Map[List[String], Long] = docWords.values.flatten
      .groupBy(identity).map { case (w, g) =>
        w.toList.map(_.toString) -> g.size.toLong
      }
    val merges = (1 to MiningQueries.BpeMerges).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (toks, cnt) =>
        toks.zip(toks.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + cnt)
      }
      val ((x, y), w) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      def merge(ts: List[String]): List[String] = ts match {
        case a :: b :: rest if a == x && b == y => (x + y) :: merge(rest)
        case a :: rest => a :: merge(rest)
        case Nil => Nil
      }
      syms = syms.groupBy { case (ts, _) => merge(ts) }
        .map { case (ts, g) => ts -> g.values.sum }
      (x, y, w)
    }
    (merges, syms)
  }

  /** Brute-force co-purchase edge set (support >= TriSupport), shared by
    * the triangle and k-core tests.
    */
  private lazy val referenceEdges: Set[(Long, Long)] = {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    li.groupBy(_._1).values.foreach { order =>
      val parts = order.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        support((parts(i), parts(j))) =
          support.getOrElse((parts(i), parts(j)), 0) + 1
    }
    // .iterator first: Map.collect with a pair-valued function resolves
    // to the MAP-REBUILDING overload, which would silently collapse the
    // edge set to one edge per distinct first endpoint (and did, leaving
    // the triangle comparison vacuously empty until the k-core test
    // tripped over it).
    support.iterator.collect {
      case (e, c) if c >= MiningQueries.TriSupport => e
    }.toSet
  }

  test("q_bpe_merges replays a plain-Scala reference BPE trainer") {
    val rows = SparkEntry.queries("q_bpe_merges")(spark, sf).collect()
    assert(rows.length == MiningQueries.BpeMerges)
    val expected = referenceBpe._1
    rows.zip(expected).foreach { case (r, (x, y, w)) =>
      assert(r.getString(1) == x && r.getString(2) == y && r.getLong(4) == w,
        s"step ${r.getInt(0)}: got (${r.getString(1)},${r.getString(2)},${r.getLong(4)}) want ($x,$y,$w)")
      assert(r.getString(3) == x + y)
    }
    // the learned rules must be genuinely useful: strictly decreasing-or-
    // equal weights and every merge above zero
    assert(expected.forall(_._3 > 0))
  }

  test("q_graph_triangles matches brute-force triangle counting") {
    val rows = SparkEntry.queries("q_graph_triangles")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)

    val edges = referenceEdges
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val triPer = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    edges.foreach { case (a, b) =>
      (adj(a) intersect adj(b)).foreach { c =>
        if (c > b) { // each triangle once (a < b < c by edge normalization)
          triPer(a) += 1; triPer(b) += 1; triPer(c) += 1
        }
      }
    }
    val want = triPer.toSeq.sortBy { case (p, n) => (-n, p) }.take(rows.length)
    // a short `want` would make the zip comparison vacuous — pin lengths
    assert(want.length == rows.length,
      s"reference found ${want.length} triangle-bearing parts, query ${rows.length}")
    rows.zip(want).foreach { case (r, (p, n)) =>
      assert(r.getLong(0) == p && r.getLong(1) == n,
        s"got (${r.getLong(0)}, ${r.getLong(1)}) want ($p, $n)")
    }
  }

  test("q_bpe_tokenize vocabulary matches the reference trainer's tokenization") {
    val rows = SparkEntry.queries("q_bpe_tokenize")(spark, sf).collect()
    val vocab = scala.collection.mutable.Map.empty[String, Long]
    referenceBpe._2.foreach { case (toks, cnt) =>
      toks.foreach(t => vocab(t) = vocab.getOrElse(t, 0L) + cnt)
    }
    val want = vocab.toSeq.sortBy { case (t, c) => (-c, t) }.take(25)
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == want)
    // the learned merges must actually appear in the applied vocabulary
    val merged = referenceBpe._1.map { case (x, y, _) => x + y }.toSet
    assert(vocab.keySet.intersect(merged).nonEmpty,
      "no learned merge symbol survives in the final vocabulary")
  }

  test("q_bpe_doclen matches per-doc token totals from the reference tokenizer") {
    val rows = SparkEntry.queries("q_bpe_doclen")(spark, sf).collect()
    val tokOf: Map[String, Long] = referenceBpe._2.map { case (toks, _) =>
      toks.mkString("") -> toks.length.toLong
    }
    val want = docWords.toSeq.sortBy(_._1).map { case (id, ws) =>
      val nTok = ws.map(tokOf).sum
      (id, ws.length.toLong, nTok, nTok * 1000 / ws.length)
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq == want)
    // merges must compress: some document needs fewer tokens than chars
    val chars = docWords.map { case (id, ws) => id -> ws.map(_.length.toLong).sum }
    assert(rows.exists(r => r.getLong(2) < chars(r.getLong(0))))
  }

  test("q_graph_kcore matches brute-force fixed-round peeling") {
    val rows = SparkEntry.queries("q_graph_kcore")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)

    var edges = referenceEdges
    for (_ <- 1 to MiningQueries.KcoreRounds) {
      val deg = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
      edges.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
      val keep = deg.collect {
        case (u, dgr) if dgr >= MiningQueries.KcoreK => u
      }.toSet
      edges = edges.filter { case (a, b) => keep(a) && keep(b) }
    }
    val deg = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    edges.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
    val want = deg.toSeq.sortBy { case (p, n) => (-n, p) }.take(rows.length)
    assert(want.length == rows.length,
      s"reference kept ${want.length} vertices, query ${rows.length}")
    rows.zip(want).foreach { case (r, (p, n)) =>
      assert(r.getLong(0) == p && r.getLong(1) == n,
        s"got (${r.getLong(0)}, ${r.getLong(1)}) want ($p, $n)")
    }
    // peeling must have removed something, or the test is vacuous
    assert(edges.size < referenceEdges.size,
      "k-core peel removed no edges at this SF; raise KcoreK")
  }

  test("q_jaccard_prefix finds exactly the above-threshold pairs (lossless prune)") {
    val rows = SparkEntry.queries("q_jaccard_prefix")(spark, sf).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet

    val sets = shingleSets
    val ids = sets.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices.iterator
      j <- (i + 1 until ids.length).iterator
      a = sets(ids(i)); b = sets(ids(j))
      if a.nonEmpty || b.nonEmpty
      inter = (a intersect b).size
      uni = a.size + b.size - inter
      if uni > 0 && inter * MiningQueries.JacDen >= uni * MiningQueries.JacNum
    } yield (ids(i), ids(j))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // verify the reported jaccard values against the sets
    rows.foreach { r =>
      val (ia, ib) = (r.getLong(0), r.getLong(1))
      val inter = (sets(ia) intersect sets(ib)).size
      assert(r.getLong(2) == inter.toLong)
      assert(r.getLong(3) == (sets(ia).size + sets(ib).size - inter).toLong)
    }
  }

  test("q_semantic_decontam matches driver-side exact cosine flagging") {
    val rows = SparkEntry.queries("q_semantic_decontam")(spark, sf).collect()
    val vecs = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val evalIds = vecs.keys.filter(_ % MiningQueries.EvalMod == 0).toSeq.sorted
    val want = vecs.keys.filter(_ % MiningQueries.EvalMod != 0).toSeq.sorted.flatMap { id =>
      val best = evalIds.map(e => (e, cos(vecs(id), vecs(e))))
        .minBy { case (e, s) => (-s, e) }
      if (best._2 >= MiningQueries.DecontamSim) Some((id, best._1)) else None
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == want)
    assert(rows.nonEmpty, "threshold should flag at least one vector at sf0.01")
  }
}
