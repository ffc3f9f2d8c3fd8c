package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe harness (VERDICT r12 item 1): measures the heaviest
  * pipeline families at 1×/10×/100× of sf0.1 to convert the "survives
  * 100 TB by design" claims from plan inspection into measurement.
  *
  * Corpus synthesis is DETERMINISTIC replication with key remapping —
  * a generated artifact under /tmp, never committed:
  *
  *  - `documents`: doc_id strides by (max+1) per replica; every token
  *    of `text` gets a replica suffix (replica 0 keeps the original),
  *    so replicas are NOT near-duplicates of each other — shingle/
  *    minhash/band structures keep the base corpus's duplicate rate
  *    instead of collapsing into k-sized duplicate clusters whose
  *    candidate pairs would grow quadratically BY CONSTRUCTION (that
  *    would measure the synthesizer, not the engine);
  *  - `embeddings`: vec_id strides; vectors circularly rotate by
  *    (replica mod 64) positions — norms and intra-replica geometry
  *    are preserved, cross-replica cosine decorrelates (replicas
  *    64 apart share a rotation: ~k/64 residual cross-similarity,
  *    noted in SCALE.md);
  *  - `lineitem`/`orders`/`customer`: join keys stride by (max+1) so
  *    the purchase graph becomes k disjoint copies — PageRank's edge
  *    count scales exactly k× with no artificial supernodes.
  *
  * Per (query, scale): min-of-2 wall time through the noop sink (full
  * compute, no driver collect — Bench's methodology), executed-plan
  * shape (exchanges, join strategies, codegen fallbacks), and driver
  * heap in use after a GC. Pins evaluated by `tools/scale_check.py`
  * and written up in SCALE.md:
  *
  *   (a) near-linear growth: t(100×)/t(10×) within a generous linear
  *       envelope (≤ 20× — parquet scan + shuffle constants shrink
  *       per-row as scale grows, superlinear means a design break);
  *   (b) no codegen fallbacks at any scale, and join-strategy flips
  *       recorded (broadcast→shuffled at scale is the DESIGNED
  *       stats-based behavior for the phash candidate join — flagged,
  *       adjudicated in SCALE.md, not auto-failed);
  *   (c) flat driver memory: post-GC heap at 100× bounded by a
  *       constant (centroids/codebooks/seeds), not by corpus size.
  *
  * Usage: runMain graft.ScaleProbe [baseSfDir] [scales] [outJson]
  *   defaults: /root/testdata/sf0.1  1,10,100  SCALE_PROBE.json
  */
object ScaleProbe {

  /** The heavy families VERDICT r12 names, one per candidate-generation
    * design: band-join minhash, pointer-jumping clusters, LSH probe,
    * IVF-cell semdedup, winnowing spans, phash bucket join, BSP
    * pagerank.
    */
  val targets: Seq[String] = Seq(
    "q_dedup_minhash", "q_dedup_clusters", "q_ann_lsh", "q_semdedup",
    "q_text_winnow", "q_multimodal_phash", "q_pagerank")

  private def maxPlusOne(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head.getLong(0) + 1L

  /** Replicate `base` k× into `dest` with the remappings above. Tables
    * not needed by the targets are copied once, unscaled, so the dir is
    * a complete drop-in for Tables.load.
    */
  def synthesize(spark: SparkSession, base: String, k: Int, dest: String): Unit = {
    val marker = Paths.get(dest, ".complete")
    if (Files.exists(marker)) return
    new java.io.File(dest).mkdirs()
    val reps = explode(sequence(lit(0), lit(k - 1))).as("rep")

    // replicated frames inherit the base table's FEW input splits —
    // repartition so the write (and every later scan) parallelizes
    val par = spark.sparkContext.defaultParallelism
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val docStride = maxPlusOne(docs, "doc_id")
    docs.select(col("*"), reps)
      .withColumn("doc_id", col("doc_id") + col("rep") * docStride)
      .withColumn("text",
        when(col("rep") === 0, col("text")).otherwise(
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1r"), col("rep").cast("string")))))
      .drop("rep")
      .repartition(par)
      .write.mode("overwrite").parquet(s"$dest/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val vecStride = maxPlusOne(emb, "vec_id")
    emb.select(col("*"), reps)
      .withColumn("vec_id", col("vec_id") + col("rep") * vecStride)
      .withColumn("sh", (col("rep") % dim).cast("int"))
      .withColumn("embedding",
        when(col("sh") === 0, col("embedding")).otherwise(
          concat(expr(s"slice(embedding, sh + 1, $dim - sh)"),
            expr("slice(embedding, 1, sh)"))))
      .drop("rep", "sh")
      .repartition(par)
      .write.mode("overwrite").parquet(s"$dest/embeddings.parquet")

    val ord = spark.read.parquet(s"$base/orders.parquet")
    val cust = spark.read.parquet(s"$base/customer.parquet")
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    val ordStride = maxPlusOne(ord, "o_orderkey")
    val custStride = maxPlusOne(cust, "c_custkey")
    val suppStride = maxPlusOne(li, "l_suppkey")
    ord.select(col("*"), reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * ordStride)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * custStride)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$dest/orders.parquet")
    cust.select(col("*"), reps)
      .withColumn("c_custkey", col("c_custkey") + col("rep") * custStride)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$dest/customer.parquet")
    li.select(col("*"), reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * ordStride)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * suppStride)
      .drop("rep")
      .repartition(par)
      .write.mode("overwrite").parquet(s"$dest/lineitem.parquet")

    for (t <- Tables.names
         if !Seq("documents", "embeddings", "orders", "customer", "lineitem").contains(t))
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$dest/$t.parquet")
    Files.createFile(marker)
  }

  /** Post-GC used heap. Three GC passes with pauses: broadcast and
    * block cleanup runs through the ContextCleaner's weak-reference
    * queue, which needs a GC to enqueue and a beat to process before a
    * second GC can actually reclaim the freed blocks.
    */
  private def usedHeapAfterGc(): Long = {
    for (_ <- 1 to 3) { System.gc(); Thread.sleep(400) }
    val rt = Runtime.getRuntime
    rt.totalMemory() - rt.freeMemory()
  }

  final case class PlanShape(
      exchanges: Int, broadcastJoins: Int, sortMergeJoins: Int,
      shuffledHashJoins: Int, nestedLoopJoins: Int, codegenFallback: Boolean)

  private def planShape(df: DataFrame): PlanShape = {
    val p = df.queryExecution.executedPlan.toString
    def n(s: String): Int = {
      var c = 0; var i = p.indexOf(s)
      while (i >= 0) { c += 1; i = p.indexOf(s, i + 1) }
      c
    }
    PlanShape(
      exchanges = n("Exchange"),
      broadcastJoins = n("BroadcastHashJoin") + n("BroadcastNestedLoopJoin"),
      sortMergeJoins = n("SortMergeJoin"),
      shuffledHashJoins = n("ShuffledHashJoin"),
      nestedLoopJoins = n("CartesianProduct"),
      // a non-codegen'd leaf inside a supported span shows as this marker
      codegenFallback = p.contains("CodegenFallback"))
  }

  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,10,100").split(',').map(_.trim.toInt).toSeq
    val outJson = args.lift(2).getOrElse("SCALE_PROBE.json")
    // optional comma-separated query list — re-probe a subset of the
    // default targets or probe ANY catalog queries whose inputs the
    // synthesizer scales (documents/embeddings/orders/customer/lineitem)
    val runTargets = args.lift(3) match {
      case Some(f) => f.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      case None => targets
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE ON: the probe is about cluster behavior (skew handling,
      // partition coalescing, runtime join re-planning) — the exact
      // configuration Verify runs with and a cluster deployment uses.
      .config("spark.sql.adaptive.enabled", "true")
      // One session spans three orders of magnitude of data: let AQE
      // pick per-stage partition counts by starting shuffles wide and
      // coalescing down (a fixed 32 at 100× makes ~GB partitions that
      // spill; a cluster deployment sets exactly this knob)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "256"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.registerSessionFunctions(spark)

    // JVM warm-up on a DIFFERENT dir (sf0.01): absorbs codegen, class
    // loading and session warm-up without touching the per-dir caches
    // the measured scales use — the x1 numbers would otherwise carry
    // ~10 s of first-ever-run overhead (measured) that no other scale
    // pays, wrecking the growth ratios.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
    for (q <- runTargets) {
      SparkEntry.queries(q)(spark, warmDir).queryExecution.toRdd.foreach(_ => ())
    }
    spark.catalog.clearCache()
    System.err.println("[scale] warm-up pass done")

    val sb = new StringBuilder("{")
    var first = true
    for (k <- scales) {
      val dir =
        if (k == 1) base
        else {
          val d = s"/tmp/graft_scale_x$k"
          val t0 = System.nanoTime()
          synthesize(spark, base, k, d)
          System.err.println(f"[scale] x$k synth ${(System.nanoTime() - t0) / 1e9}%.1f s")
          d
        }
      for (q <- runTargets) {
        val fn = SparkEntry.queries(q)
        // execute THROUGH the Dataset's own QueryExecution (full
        // compute on InternalRows, no driver collect) so the captured
        // executedPlan is the FINAL adaptive plan, not AQE's initial
        // guess — join-strategy flips are exactly what's under test
        // timing STARTS BEFORE construction: the iterative queries
        // (pagerank, clusters) run their checkpointed loops eagerly
        // while building the frame — that loop IS the scaling behavior
        // under test. One cold run per scale: their per-dir caches
        // (edges, signatures) memoize, so a second run would measure a
        // warm cache, not the query.
        def once(): (Double, PlanShape) = {
          val t0 = System.nanoTime()
          val df = fn(spark, dir)
          df.queryExecution.toRdd.foreach(_ => ())
          ((System.nanoTime() - t0) / 1e9, planShape(df))
        }
        val (sec, shape) = once()
        if (!first) sb.append(',')
        first = false
        sb.append(s""""${q}_x$k":{"sec":${f"$sec%.3f"},""" +
          s""""exchanges":${shape.exchanges},"bhj":${shape.broadcastJoins},""" +
          s""""smj":${shape.sortMergeJoins},"shj":${shape.shuffledHashJoins},""" +
          s""""cartesian":${shape.nestedLoopJoins},""" +
          s""""codegen_fallback":${shape.codegenFallback}}""")
        System.err.println(f"[scale] $q x$k: $sec%.3f s, " +
          s"ex=${shape.exchanges} bhj=${shape.broadcastJoins} " +
          s"smj=${shape.sortMergeJoins} shj=${shape.shuffledHashJoins}")
      }
      // driver-retention pin: drop every persisted block (they live in
      // THIS heap under local mode — executor memory, not driver state)
      // AND the per-dir memo caches (their executed plans pin broadcast
      // hash relations on the driver — QueryCaches scaladoc), then GC;
      // what remains post-GC is genuine driver retention
      // (seeds/centroids/codebooks), the thing that must stay flat
      spark.catalog.clearCache()
      QueryCaches.clearAll()
      val heap = usedHeapAfterGc()
      sb.append(s""","heap_after_x${k}_mb":${heap / (1024 * 1024)}""")
      System.err.println(s"[scale] post-x$k driver heap: ${heap / (1024 * 1024)} MB")
    }
    sb.append('}')
    Files.writeString(Paths.get(outJson), sb.toString)
    println(sb.toString)
    spark.stop()
  }
}
