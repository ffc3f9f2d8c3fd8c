package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-level evidence for the two scale techniques that don't show up
  * in the oracle gate: bucketed co-located joins (no shuffle before the
  * join) and salted aggregation (same result as the direct groupBy).
  */
class ScaleTechniquesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: bucket layout satisfies the join distribution, so no
    // ShuffleExchange feeds the join
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n${plan.take(2000)}")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE ord_bucketed")
  }

  test("q_bucket_join consumes the bucketed layout without shuffling either side") {
    // Broadcast disabled so the tiny sf0.001 sides can't sidestep the
    // layout: the point is the SortMergeJoin consuming bucketed scans
    // directly. The only Exchange in the whole plan is the groupBy
    // boundary ABOVE the join; the join subtree (printed after the join
    // node) must be exchange-free.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.SparkEntry.queries("q_bucket_join")(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      val joinAt = plan.indexOf("SortMergeJoin")
      assert(joinAt >= 0, plan.take(1500))
      val subtree = plan.substring(joinAt)
      assert(!subtree.contains("Exchange"),
        s"bucketed join sides re-shuffled:\n${subtree.take(1500)}")
      // and the result is the oracle's: 5 market segments
      assert(df.count() == 5)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("incremental and curation plans carry no nested-loop or cartesian joins") {
    // The plan shapes these operators claim (bucket equi-joins, broadcast
    // join-backs, map-only scans) must not silently degrade to a
    // nested-loop product if a join condition is edited.
    val sf = "/root/testdata/sf0.001"
    // No query may plan a non-broadcast CartesianProduct. The stricter
    // no-nested-loop-at-all bar applies to the join-driven operators;
    // q_boilerplate / q_lm_unigram legitimately carry ONE
    // BroadcastNestedLoopJoin each — the deliberate 1-row broadcast
    // stats pattern (crossJoin(broadcast(tot))), a constant-size build.
    val statsPattern = Set("q_boilerplate", "q_lm_unigram")
    val plans = (Seq("q_dedup_incremental", "q_ann_incremental",
      "q_winnow_crossdup", "q_stream_join") ++ statsPattern).map { q =>
      q -> graft.SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
    }
    plans.foreach { case (q, plan) =>
      withClue(s"$q plan:") {
        assert(!plan.contains("CartesianProduct"))
        if (!statsPattern(q)) assert(!plan.contains("BroadcastNestedLoopJoin"))
      }
    }
    // The PII scrub is map-only: its single exchange is the final sort.
    val pii = graft.SparkEntry.queries("q_pii_redact")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(pii).length <= 1,
      s"q_pii_redact must stay map-only plus one sort exchange:\n${pii.take(1500)}")
  }

  test("q_multimodal_phash band join survives with broadcast disabled") {
    // The toy-scale plan broadcasts the band frame's build side by size
    // estimation; at 100 TB both sides are corpus-sized, so the shape
    // must also plan (and agree) as a plain shuffled equi-join on
    // (band, bsig) — never a cartesian/nested-loop product.
    val sf = "/root/testdata/sf0.001"
    val broadcastOn = graft.SparkEntry.queries("q_multimodal_phash")(spark, sf)
      .collect()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.SparkEntry.queries("q_multimodal_phash")(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join on (band, bsig):\n${plan.take(1500)}")
      assert(df.collect().toSeq == broadcastOn.toSeq,
        "band-join results must not depend on the join strategy")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hot-shingle df cutoff excludes a planted stop-shingle from candidates") {
    import spark.implicits._
    // shingle 100 is "hot": present in all 5 docs (df = 5); shingle 200
    // is a genuine near-dup signal shared by docs 1 and 2 only.
    val sh = ((1L to 5L).map(d => (d, 100L)) ++ Seq((1L, 200L), (2L, 200L)))
      .toDF("doc_id", "sh")
    val guarded = graft.queries.DedupQueries.ngramCandidates(sh, maxDocFreq = 5)
      .as[(Long, Long)].collect().toSet
    assert(guarded == Set((1L, 2L)),
      s"hot shingle must not generate pairs, got $guarded")
    // Raising the cutoff past the hot shingle's df restores all C(5,2) pairs.
    val unguarded = graft.queries.DedupQueries.ngramCandidates(sh, maxDocFreq = 6)
      .collect().length
    assert(unguarded == 10)
  }

  test("jaccardPairs: hot shingles are excluded from pairing but still counted in scores") {
    import spark.implicits._
    // shingle 100 is hot (all 5 docs); shingle 200 is cold (docs 1, 2).
    val sh = ((1L to 5L).map(d => (d, 100L)) ++ Seq((1L, 200L), (2L, 200L)))
      .toDF("doc_id", "sh")
    val pairs = graft.queries.DedupQueries.jaccardPairs(sh, maxDocFreq = 5)
      .select("ia", "ib", "jac")
      .as[(Long, Long, Double)].collect().toSet
    // only (1,2) shares a cold shingle — pairs sharing ONLY the hot one
    // (e.g. 3,4) must not be generated...
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L)))
    // ...but the surviving pair's Jaccard counts the hot common too:
    // common = {100, 200}, |A| = |B| = 2 -> jac = 2/(2+2-2) = 1.0
    // (without the hot correction it would read 1/3)
    assert(pairs.head._3 == 1.0)
  }

  test("connected components on a 1e5-edge chain: log-diameter iterations, reliable-checkpoint switch") {
    import spark.implicits._
    val n = 100000
    // Chain 0-1-2-...-n: the worst case for plain label propagation
    // (diameter = n); pointer jumping must close it in ~log2(n) rounds.
    val edges = spark.range(n).select($"id".as("a"), ($"id" + 1).as("b"))

    val (labels, iters) =
      ConnectedComponents.labelPropagateWithStats(spark, edges, maxIter = 25)
    val distinctLabels = labels.select("label").distinct().collect()
    assert(distinctLabels.map(_.getLong(0)).toSeq == Seq(0L))
    assert(labels.count() == n + 1)
    // log2(1e5) ~ 17; a linear-diameter regression would hit maxIter
    withClue(s"iterations=$iters:") { assert(iters <= 20) }

    // Reliable-checkpoint mode: same answer, checkpoint files actually
    // written to the configured dir (the executor-loss-survivable path
    // a real cluster selects).
    val ckDir = java.nio.file.Files.createTempDirectory("graft_cc_ck")
    spark.conf.set("spark.graft.cc.checkpointDir", ckDir.toString)
    try {
      val (labels2, _) = ConnectedComponents.labelPropagateWithStats(
        spark, edges.limit(1000), maxIter = 25)
      assert(labels2.select("label").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L))
      val wrote = java.nio.file.Files.walk(ckDir).filter(f =>
        java.nio.file.Files.isRegularFile(f)).count()
      assert(wrote > 0, "no reliable checkpoint files were written")
    } finally {
      spark.conf.unset("spark.graft.cc.checkpointDir")
    }
  }

  test("local union-find path equals the distributed fixpoint") {
    import spark.implicits._
    // Deterministic messy graph: chains, a star, self-loops, dup edges,
    // reversed edges, and a few cross-links merging components.
    val edges = (
      (0L until 400L).map(i => (i * 7 % 1000, i * 13 % 1000)) ++
        Seq((5L, 5L), (1L, 2L), (2L, 1L), (999L, 0L))
      ).toDF("a", "b")
    val distributed = ConnectedComponents
      .labelPropagateWithStats(spark, edges, maxIter = 25)._1
      .as[(Long, Long)].collect().toMap
    // Force the local path regardless of the default threshold.
    spark.conf.set("spark.graft.cc.localThreshold", "1000000")
    val local =
      try ConnectedComponents.labelPropagate(spark, edges)
        .as[(Long, Long)].collect().toMap
      finally spark.conf.unset("spark.graft.cc.localThreshold")
    assert(local.size == distributed.size)
    assert(local == distributed)
    // And the representative really is the component minimum.
    assert(local.forall { case (node, label) => label <= node })
  }

  test("deep PageRank: 25 iterations on a 1e5-edge graph stays bounded and mass-conserving") {
    import spark.implicits._
    val n = 100000L
    // Ring 0->1->...->n-1->0: every node has an incoming edge (the
    // operator's contract) and outdeg 1, so mass only shrinks by the
    // deliberate floor-division leak. 25 iterations exercises the
    // periodic localCheckpoint cuts (interval 8 -> cuts at 8, 16, 24,
    // 25); without lineage truncation the accumulated plan tree makes
    // driver-side analysis alone blow past the wall-clock bound here.
    val edges = spark.range(n).select($"id".as("src"), (($"id" + 1) % n).as("dst"))
    val t0 = System.nanoTime()
    val ranks = graft.ops.PageRank.run(edges, iterations = 25)
    val rows = ranks.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rows.length == n)
    // Uniform by symmetry: every node must hold exactly base rank.
    val prs = rows.map(_.getLong(1)).distinct
    assert(prs.length == 1, s"ring ranks not uniform: ${prs.take(5).toSeq}")
    assert(math.abs(prs.head - graft.ops.PageRank.Scale / n) <= 1)
    withClue(s"25-iteration run took $secs s:") { assert(secs < 120.0) }
  }

  test("salted aggregation equals the direct groupBy") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("total"))
      .orderBy("l_returnflag").collect()
    val salted = Skew.saltedCountSum(
        li, "l_returnflag", col("l_quantity").cast("decimal(18,2)"), 16)
      .orderBy("l_returnflag").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSeq ==
      direct.map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSeq)
  }
}
