package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the adversarial-skew corpus synthesizer (r14): pathology
  * DENSITY is constant (30% dup docs / 50% boilerplate / 10% hot
  * vectors at every scale) while exact-duplicate CLUSTER SIZE is bounded
  * and independent of the replication factor k. The bound is the
  * property that keeps the probe honest — clusters growing with k make
  * pair-enumeration output Ω(k²) by construction, which no engine can
  * hold a linear envelope against (it would measure the synthesizer,
  * not the engine; ScaleProbe.synthesizeSkew scaladoc).
  */
class SkewSynthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val base = "/root/testdata/sf0.001"

  private def synth(k: Int): String = {
    val dest = s"/tmp/graft_skew_spec_x$k"
    // fresh synth every run: the spec must test the current code
    val dir = new java.io.File(dest)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
    ScaleProbe.synthesizeSkew(spark, base, k, dest)
    dest
  }

  test("skew pathologies: constant density, k-independent cluster bounds") {
    val d16 = synth(16)
    val d32 = synth(32)

    def docStats(d: String, k: Int): (Long, Long, Double, Double) = {
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val n = docs.count()
      assert(n == k * spark.read.parquet(s"$base/documents.parquet").count())
      val cl = docs.groupBy(md5(col("text")).as("fp"))
        .agg(count(lit(1)).as("m"))
      val maxCluster = cl.agg(max("m")).head.getLong(0)
      val dupRows = cl.filter(col("m") >= 2).agg(sum("m")).head.getLong(0)
      val preambleRows = docs
        .filter(col("text").startsWith("terms of service apply")).count()
      (n, maxCluster, dupRows.toDouble / n, preambleRows.toDouble / n)
    }
    val (_, max16, dupFrac16, pre16) = docStats(d16, 16)
    val (_, max32, dupFrac32, pre32) = docStats(d32, 32)
    // dup docs repeat per 8-replica block: cluster size exactly 8,
    // unchanged when k doubles (count of clusters doubles instead)
    assert(max16 == 8L && max32 == 8L)
    // 30% of rows sit in exact-dup clusters, 50% carry the preamble —
    // density constant across scales
    assert(math.abs(dupFrac16 - 0.3) < 0.05 && math.abs(dupFrac32 - 0.3) < 0.05)
    assert(math.abs(pre16 - 0.5) < 0.05 && math.abs(pre32 - 0.5) < 0.05)

    def vecStats(d: String): (Long, Double) = {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val n = emb.count()
      val cl = emb.groupBy("embedding").agg(count(lit(1)).as("m"))
      val maxCluster = cl.agg(max("m")).head.getLong(0)
      val dupRows = cl.filter(col("m") >= 2).agg(sum("m")).head.getLong(0)
      (maxCluster, dupRows.toDouble / n)
    }
    val (vmax16, vdup16) = vecStats(d16)
    val (vmax32, vdup32) = vecStats(d32)
    // exact-tie clusters are donor-injective per (hot index, block):
    // 8 copies + the donor's own unrotated replica-0 row — the max does
    // NOT grow when k doubles (cluster COUNT doubles instead)
    assert(vmax16 == vmax32 && vmax16 <= 9L)
    // ~10% of rows are planted copies (+1/8 donor rows each)
    assert(math.abs(vdup16 - 0.112) < 0.05 && math.abs(vdup32 - 0.112) < 0.05)

    // supernode graph: hub supplier holds ~30% of lineitems and the hub
    // part sits in ~14% of them at BOTH scales (constant fraction →
    // hub degree grows linearly with the graph, like real supernodes)
    def hubStats(d: String, k: Int): (Double, Double) = {
      val li = spark.read.parquet(s"$d/lineitem.parquet")
      val n = li.count().toDouble
      assert(li.count() ==
        k * spark.read.parquet(s"$base/lineitem.parquet").count())
      (li.filter(col("l_suppkey") === 0).count() / n,
        li.filter(col("l_partkey") === 0).count() / n)
    }
    val (supp16, part16) = hubStats(d16, 16)
    val (supp32, part32) = hubStats(d32, 32)
    assert(math.abs(supp16 - 0.3) < 0.05 && math.abs(supp32 - 0.3) < 0.05)
    assert(math.abs(part16 - 1.0 / 7) < 0.05 && math.abs(part32 - 1.0 / 7) < 0.05)
  }

  test("stream-skew pathologies: pure planted keys, constant density, unique ids") {
    // r16 (verdict r15 advice): non-planted user ids offset by +2, so
    // user_id 0 holds ONLY the hot-key plant and user_id 1 only bursts —
    // at every replica including rep 0 (whose base users 0/1 previously
    // leaked in). Burst wins where both flags fire, so the hot share is
    // 20% − (burst ∩ hot) — both fractions constant across k.
    def synthStream(k: Int): String = {
      val dest = s"/tmp/graft_streamskew_spec_x$k"
      val dir = new java.io.File(dest)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir)
      }
      ScaleProbe.synthesizeStreamSkew(spark, base, k, dest)
      dest
    }
    for (k <- Seq(4, 8)) {
      val d = synthStream(k)
      val ev = Tables.load(spark, d, "events")
      val baseEv = Tables.load(spark, base, "events")
      val nBase = baseEv.count()
      val n = ev.count()
      assert(n == k * nBase)
      assert(ev.select("event_id").distinct().count() == n, "event ids must stay unique")
      val hotFrac = ev.filter(col("user_id") === 0L).count().toDouble / n
      val burstFrac = ev.filter(col("user_id") === 1L).count().toDouble / n
      // hot = (event_id % 10 < 2) minus the rows burst precedence takes
      assert(math.abs(hotFrac - 0.2) < 0.01, s"hot frac $hotFrac at x$k")
      // 1/997 ≈ 0.001, quantized coarsely by the tiny sf0.001 base table
      assert(burstFrac > 0.0005 && burstFrac < 0.004, s"burst frac $burstFrac at x$k")
      // purity: user 0/1 rows carry exactly the planted flags — the ids
      // are base_id + rep·eStride, so base_id = pmod(id, eStride)
      val stride = baseEv.agg(max(col("event_id"))).head.getLong(0) + 1L
      val planted = ev.filter(col("user_id") < 2L)
      val wrongHot = planted.filter(col("user_id") === 0L &&
        !(pmod(col("event_id"), lit(stride)) % 10 < 2)).count()
      val wrongBurst = planted.filter(col("user_id") === 1L &&
        !(pmod(col("event_id"), lit(stride)) % 997 === 0)).count()
      assert(wrongHot == 0L && wrongBurst == 0L, "planted keys must be pure")
      // bursts compress into the first 30 min of their replica block
      val lo = baseEv.agg(min(unix_micros(col("ts")))).head.getLong(0)
      val span = baseEv.agg(max(unix_micros(col("ts")))).head.getLong(0) - lo +
        3600L * 1000000L
      val outOfBlock = ev.filter(col("user_id") === 1L)
        .filter(pmod(unix_micros(col("ts")) - lo, lit(span)) >= 1800L * 1000000L)
        .count()
      assert(outOfBlock == 0L, "bursts must sit in the first 30 minutes of their block")
    }
  }
}
