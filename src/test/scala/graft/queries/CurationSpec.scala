package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Behavior checks for the curation/fingerprint operators beyond the
  * DuckDB hash gate: the winnow query is validated against an
  * independent driver-side reimplementation, decontamination hits are
  * re-verified on raw text, and BM25 ordering is pinned to the tf
  * structure it claims to rank by.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  /** Independent winnowing: same definition (k-gram md5-60bit hashes,
    * min per w-window, distinct), written as a plain Scala loop so a
    * bug in the SQL window/explode plumbing can't cancel itself out.
    */
  private def winnowRef(text: String, k: Int, w: Int): Set[Long] = {
    val t = text.toLowerCase
    if (t.length < k + w - 1) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 to t.length - k).map { i =>
      val hex = md.digest(t.substring(i, i + k).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    hs.sliding(w).map(_.min).toSet
  }

  test("q_text_winnow matches an independent reimplementation per document") {
    val rows = SparkEntry.queries("q_text_winnow")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").limit(25).collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val exp = winnowRef(r.getString(1), TextQueries.WinK, TextQueries.WinW)
      val (nFp, fpXor) = rows(r.getLong(0))
      assert(nFp == exp.size, s"doc ${r.getLong(0)} fingerprint count")
      assert(fpXor == exp.foldLeft(0L)(_ ^ _), s"doc ${r.getLong(0)} xor")
    }
  }

  test("winnowing detects a shared substring of guarantee length") {
    // The winnowing guarantee: any common substring of length
    // >= k + w - 1 produces at least one common fingerprint.
    val (k, w) = (TextQueries.WinK, TextQueries.WinW)
    val shared = "zq" * ((k + w - 1) / 2 + 1) // long enough, off-vocabulary
    val a = winnowRef(s"left padding text $shared more words here", k, w)
    val b = winnowRef(s"completely different prefix $shared other suffix", k, w)
    assert((a & b).nonEmpty)
  }

  test("q_decontaminate hits share a real word n-gram with their benchmark doc") {
    val hits = SparkEntry.queries("q_decontaminate")(spark, sf).collect()
    assert(hits.nonEmpty)
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(id: Long): Set[String] =
      texts(id).toLowerCase.split(" ").sliding(CurationQueries.ContamN)
        .map(_.mkString(" ")).toSet
    val benchGrams = texts.keys.filter(_ % CurationQueries.BenchMod == 0)
      .flatMap(grams).toSet
    hits.foreach { r =>
      val (docId, nShared, benchId) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(docId % CurationQueries.BenchMod != 0)
      assert(benchId % CurationQueries.BenchMod == 0)
      assert(nShared >= 1)
      // Every hit must be re-verifiable on raw text, not just hashes:
      // the doc really shares >= nShared n-grams with the benchmark set.
      val common = grams(docId) & benchGrams
      assert(common.size >= nShared, s"doc $docId claims $nShared, raw ${common.size}")
    }
  }

  test("q_stratified_sample applies per-language rates deterministically") {
    val rows = SparkEntry.queries("q_stratified_sample")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (_, (total, kept)) => assert(kept <= total) }
    // en keeps 2/20, zh keeps 10/20: with ~equal strata the kept
    // fraction must be visibly ordered, not merely nonzero.
    val enFrac = rows("en")._2.toDouble / rows("en")._1
    val zhFrac = rows("zh")._2.toDouble / rows("zh")._1
    assert(enFrac < zhFrac, s"en=$enFrac zh=$zhFrac")
  }

  test("q_bm25 ranks by the scoring structure it claims") {
    val out = SparkEntry.queries("q_bm25")(spark, sf).collect()
    assert(out.length == 15)
    val scores = out.map(_.getFloat(1))
    assert(scores.forall(_ > 0f))
    assert(scores.sameElements(scores.sortBy(-_.toDouble)))
    // The top document must actually contain a query term.
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val topWords = texts(out.head.getLong(0)).toLowerCase.split(" ").toSet
    assert(CurationQueries.Bm25Terms.exists(topWords.contains))
  }

  test("q_chunk_text covers every token with the declared overlap") {
    val (max, ov) = (PipelineQueries.ChunkMax, PipelineQueries.ChunkOverlap)
    val stride = max - ov
    val chunks = SparkEntry.queries("q_chunk_text")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .groupBy(_._1)
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ")).toMap
    assert(chunks.nonEmpty && chunks.keySet == texts.keySet)
    texts.foreach { case (id, words) =>
      val cs = chunks(id).sortBy(_._2)
      // contiguous ids, declared geometry, full coverage to the last token
      assert(cs.map(_._2).toSeq == cs.indices.toSeq)
      cs.foreach { case (_, cid, start, ntok, fp) =>
        assert(start == cid * stride + 1)
        assert(ntok == math.min(max, words.length - cid * stride))
        val expected = words.slice(start - 1, start - 1 + ntok).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(fp == hex, s"doc $id chunk $cid")
      }
      assert(cs.last._3 - 1 + cs.last._4 == words.length, s"doc $id coverage")
      // consecutive chunks overlap by exactly `ov` (when both are full)
      cs.sliding(2).foreach {
        case Array(a, b) if a._4 == max => assert(b._3 == a._3 + stride)
        case _ =>
      }
    }
  }

  test("q_winnow_crossdup matches an independent fingerprint-pair count") {
    val (k, w) = (TextQueries.CrossK, TextQueries.CrossW)
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sets = texts.collect {
      case (id, t) if t.length >= k + w - 1 => id -> winnowRef(t, k, w)
    }
    val df = sets.toSeq.flatMap(_._2.toSeq).groupBy(identity)
      .map { case (fp, os) => fp -> os.size }
    val kept = df.collect {
      case (fp, n) if n <= TextQueries.CrossMaxDf => fp
    }.toSet
    val expected = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      shared = (sa & sb).count(kept.contains)
      if shared >= TextQueries.CrossMinShared
    } yield (ia, ib) -> shared.toLong).toMap
    val rows = SparkEntry.queries("q_winnow_crossdup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows == expected)
    assert(rows.nonEmpty)
  }

  test("graft_winnow_set agrees with the graft_winnow summary kernel") {
    val (k, w) = (TextQueries.WinK, TextQueries.WinW)
    graft.ops.WinnowFunctions.register(spark, k, w)
    graft.ops.WinnowFunctions.registerSet(spark, k, w)
    val rows = graft.Tables.load(spark, sf, "documents").limit(50)
      .selectExpr("graft_winnow(lower(text)) AS s",
        "graft_winnow_set(lower(text)) AS fps")
      .collect()
    rows.foreach { r =>
      val (nFp, xor) = (r.getStruct(0).getLong(0), r.getStruct(0).getLong(1))
      val fps = r.getSeq[Long](1)
      assert(fps.length == nFp)
      assert(fps.foldLeft(0L)(_ ^ _) == xor)
      assert(fps == fps.sorted, "set must be sorted ascending")
    }
  }

  test("q_source_mix keeps the scarcest source whole and downsamples the rest") {
    val rows = SparkEntry.queries("q_source_mix")(spark, sf).collect()
    assert(rows.length == 20)
    val keeps = rows.map(_.getDouble(4))
    assert(keeps.max == 1.0, "retention-maximal: some source keeps 100%")
    assert(keeps.forall(kr => kr > 0.0 && kr <= 1.0))
    rows.foreach { r =>
      assert(r.getLong(5) <= r.getLong(1), "n_keep <= n")
      val resampled = r.getDouble(2) * r.getDouble(4) // share * keep_rate
      // after reweighting, relative shares must be proportional to target
      assert(math.abs(resampled / r.getDouble(3) -
        rows.head.getDouble(2) * rows.head.getDouble(4) / rows.head.getDouble(3)) < 1e-12)
    }
  }

  test("redaction chain scrubs realistic PII and leaves clean text alone") {
    // redactChain emits DuckDB-dialect SQL (explicit 'g' flag): it runs
    // on DuckDB natively and on a session with the dialect OVERRIDES
    // installed, where regexp_replace has DuckDB's flag semantics.
    graft.fm.Dialect.registerOverrides(spark)
    def redact(s: String): String =
      spark.sql(s"SELECT ${CurationQueries.redactChain(s"'$s'")} AS r")
        .head().getString(0)
    assert(redact("reach jane.doe+x@example.org or 555-1234, host 192.168.0.1 ok")
      == "reach <EMAIL> or <PHONE>, host <IP> ok")
    // replace-ALL semantics, not first-match
    assert(redact("a.b@c.io then d_e@f.co.uk done")
      == "<EMAIL> then <EMAIL> done")
    // case-insensitive: mixed-case emails are PII too
    assert(redact("write Jane.Doe@Example.COM today")
      == "write <EMAIL> today")
    assert(redact("plain text with numbers 42 and a dot. end")
      == "plain text with numbers 42 and a dot. end")
  }

  test("q_pii_redact finds exactly the injected tokens per document") {
    val rows = SparkEntry.queries("q_pii_redact")(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getInt(1) == 1, "one injected email")
      assert(r.getInt(2) == 1, "one injected phone")
      assert(r.getInt(3) == 1, "one injected IP")
    }
  }

  test("q_boilerplate matches an independent top-K doc-frequency count") {
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ")).toMap
    def bigrams(ws: Array[String]): Seq[String] =
      ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    val df = texts.values.toSeq.flatMap(ws => bigrams(ws).distinct)
      .groupBy(identity).map { case (g, os) => g -> os.size }
    val top = df.toSeq.sortBy { case (g, n) => (-n, g) }
      .take(CurationQueries.BoilerK).map(_._1).toSet
    val rows = SparkEntry.queries("q_boilerplate")(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val (id, nB, nBoil) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val bs = bigrams(texts(id))
      assert(nB == bs.size, s"doc $id bigram count")
      assert(nBoil == bs.count(top.contains), s"doc $id boilerplate count")
    }
  }

  test("q_lm_unigram matches an independent surprisal computation") {
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ")).toMap
    val counts = texts.values.toSeq.flatten
      .groupBy(identity).map { case (w, os) => w -> os.size.toLong }
    val nt = counts.values.sum.toDouble
    def unats(w: String): Long =
      math.round(((-math.log(counts(w) / nt)).toFloat).toDouble * 1000000)
    val rows = SparkEntry.queries("q_lm_unigram")(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.take(50).foreach { r =>
      val (id, n, total, ppl) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getFloat(3))
      val ws = texts(id)
      assert(n == ws.length, s"doc $id token count")
      assert(total == ws.map(unats).sum, s"doc $id total surprisal")
      assert(math.abs(ppl - math.exp(total.toDouble / n / 1e6)) < 1e-3f)
      // a corpus drawn from one unigram distribution: ppl near vocab
      // entropy, never below 1 or above vocab size
      assert(ppl >= 1f && ppl <= counts.size.toFloat * 2)
    }
  }

  test("shard assignment drives a partitioned sink write that prunes") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val docs = graft.Tables.load(spark, sf, "documents")
      .withColumn("shard", expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 64"))
    docs.write.partitionBy("shard").mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 500)
    // read-back per-shard counts equal the q_shard_plan audit
    val plan = SparkEntry.queries("q_shard_plan")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // partition-column read-back infers INT; normalize for the compare
    val counts = back.groupBy(col("shard").cast("long").as("shard"))
      .count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == plan)
    // partition pruning: a shard filter reaches the scan as a partition
    // filter (inputFiles ignores filters, so inspect the physical scan)
    val some = counts.keys.head
    val q = back.filter(col("shard") === some)
    assert(q.count() == plan(some))
    val scan = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("shard"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  test("Curation API operators run on arbitrary frames and columns") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.{col, concat, explode, expr, lit}
    val frame = Seq(
      (1L, "alpha beta alpha beta alpha beta", "news"),
      (2L, "gamma delta epsilon zeta eta theta", "web"),
      (3L, "alpha beta gamma gamma gamma gamma", "web")
    ).toDF("rec_id", "body", "origin")

    // boilerplate on custom columns: top-1 bigram is "alpha beta"
    val bp = graft.ops.Curation.boilerplate(frame, "rec_id", "body", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bp(1L) == 3L, "doc 1 has 'alpha beta' x3 among its bigrams")
    assert(bp(2L) == 0L)

    // unigram LM: the doc made of frequent words scores lower surprisal
    val lm = graft.ops.Curation.lmUnigramScore(frame, "rec_id", "body")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(lm(1L) < lm(2L), "common-word doc has lower total surprisal")

    // mixture weights on a custom group column
    val mix = graft.ops.Curation.mixtureWeights(
        frame, "origin", Map("news" -> 0.5), defaultTarget = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(mix("news") == 1.0, "under-represented group keeps 100%")
    assert(mix("web") < 1.0)

    // shard assignment is stable and in range
    val shards = frame.select(graft.ops.Curation.shardAssign("rec_id", 8))
      .collect().map(_.getLong(0))
    assert(shards.forall(sh => sh >= 0 && sh < 8))

    // redaction on a custom column
    val red = frame.select(graft.ops.Curation.redactPii(
      concat(lit("mail x@y.io "), col("body"))).as("r"))
      .head().getString(0)
    assert(red.startsWith("mail <EMAIL> "))

    // chunking on custom columns: 4-token windows, overlap 1 -> stride 3
    val chunks = graft.ops.Curation.chunkText(frame, "rec_id", "body",
        maxTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // 6 tokens -> chunk 0 covers [1,4], chunk 1 covers [4,6]
    assert(chunks.filter(_._1 == 2L).sortBy(_._2).toSeq ==
      Seq((2L, 0, 1, 4), (2L, 1, 4, 3)))

    // hash-keep is deterministic and respects a zero rate
    val kept = frame.withColumn("k",
        graft.ops.Curation.hashKeep("rec_id", lit(20), outOf = 20))
      .collect().map(_.getBoolean(3))
    assert(kept.forall(identity), "rate = outOf keeps everything")
    val none = frame.withColumn("k",
        graft.ops.Curation.hashKeep("rec_id", lit(0), outOf = 20))
      .collect().map(_.getBoolean(3))
    assert(none.forall(!_), "rate 0 keeps nothing")

    // decontamination from custom gram frames: doc 3 shares "alpha beta"
    // grams with bench doc 1
    val grams = frame.select(col("rec_id"), explode(expr(
      """transform(sequence(1, size(split(lower(body), ' ')) - 1),
        |  i -> concat_ws(' ', element_at(split(lower(body), ' '), i),
        |                      element_at(split(lower(body), ' '), i + 1)))""".stripMargin))
      .as("g")).selectExpr("rec_id",
      "CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT) AS h")
    val hits = graft.ops.Curation.decontaminateFromGrams(
        grams.filter(col("rec_id") =!= 1L),
        grams.filter(col("rec_id") === 1L)
          .select(col("rec_id").as("bench_id"), col("h")),
        idCol = "rec_id", benchIdCol = "bench_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(3L), "only doc 3 shares a bigram with doc 1")
    assert(hits(3L) == 1L, "the one shared bigram is 'alpha beta'")
  }

  test("q_quality_repetition fractions are consistent and flag agrees") {
    val rows = SparkEntry.queries("q_quality_repetition")(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (wf, bf, fl) = (r.getDouble(2), r.getDouble(3), r.getBoolean(4))
      assert(wf > 0.0 && wf <= 1.0)
      assert(bf >= 0.0 && bf <= 1.0)
      assert(fl == (wf > 0.125 || bf > 0.15))
    }
  }

  /** Same portable 60-bit hash as ops.Curation.portableHash, re-derived
    * independently (md5 hex, first 15 nibbles).
    */
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("q_domain_cap keeps exactly the hash-least docs per source") {
    val rows = SparkEntry.queries("q_domain_cap")(spark, sf).collect()
    val srcOf = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySrc = srcOf.groupBy(_._2)
    val expected = bySrc.keys.toSeq.sorted.map { s =>
      val ranked = bySrc(s).map(_._1)
        .sortBy(id => (hash60(id.toString), id))
      (s, ranked.length.toLong,
        math.min(ranked.length.toLong, CurationQueries.DomainCap),
        ranked.head)
    }
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq == expected)
    // the cap must bite at this SF for the audit to mean anything
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)))
  }

  test("q_pipeline_curate funnel agrees with independently composed stages") {
    val rows = SparkEntry.queries("q_pipeline_curate")(spark, sf).collect()
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // stage 1: per-source hash-least cap
    val cappedIds = docs.groupBy(_._2).values.flatMap { g =>
      g.map(_._1).sortBy(id => (hash60(id.toString), id))
        .take(CurationQueries.DomainCap.toInt)
    }.toSet
    // stage 2: benchmark 4-gram contamination on raw text
    def grams(t: String): Set[String] = {
      val w = t.toLowerCase.split(" ")
      if (w.length < CurationQueries.ContamN) Set.empty
      else w.sliding(CurationQueries.ContamN).map(_.mkString(" ")).toSet
    }
    val benchGrams = docs.filter(_._1 % CurationQueries.BenchMod == 0)
      .flatMap(d => grams(d._3)).toSet
    val clean = docs.filter { case (id, _, t) =>
      cappedIds(id) && id % CurationQueries.BenchMod != 0 &&
        grams(t).intersect(benchGrams).isEmpty
    }
    val expected = docs.groupBy(_._2).keys.toSeq.sorted.map { s =>
      val all = docs.filter(_._2 == s)
      val cl = clean.filter(_._2 == s)
      (s, all.length.toLong,
        math.min(all.length.toLong, CurationQueries.DomainCap),
        cl.length.toLong,
        cl.map(_._3.toLowerCase.split(" ").length.toLong).sum)
    }
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == expected)
    // every stage must drop something somewhere, or the funnel is vacuous
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)))
    assert(rows.exists(r => r.getLong(3) < r.getLong(2)))
  }

  test("q_mix_temperature replays the exact-integer temperature plan") {
    val rows = SparkEntry.queries("q_mix_temperature")(spark, sf).collect()
    val srcOf = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nBySrc = srcOf.groupBy(_._2).map { case (s, g) => s -> g.size.toLong }
    def roundHalfUp(x: Double): Long =
      new java.math.BigDecimal(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val sMicro = nBySrc.map { case (s, n) =>
      // float-collapsed sqrt on the micro grid, same as both engines
      s -> roundHalfUp(math.sqrt(n.toDouble).toFloat.toDouble * 1e6)
    }
    val totMicro = sMicro.values.sum
    val totDocs = nBySrc.values.sum
    val expected = nBySrc.keys.toSeq.sorted.map { s =>
      val share = sMicro(s) * 1000000L / totMicro
      val rate = math.min(1000000L, share * (totDocs / 2) / nBySrc(s))
      val sampled = srcOf.count { case (id, src) =>
        src == s && hash60(id.toString) % 1000000L < rate
      }.toLong
      (s, nBySrc(s), share, rate, sampled)
    }
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == expected)
    // temperature must actually flatten the mix: the rarest source's
    // rate is at least the most common source's rate
    val rates = rows.map(r => r.getLong(1) -> r.getLong(3))
    assert(rates.minBy(_._1)._2 >= rates.maxBy(_._1)._2)
  }
}
