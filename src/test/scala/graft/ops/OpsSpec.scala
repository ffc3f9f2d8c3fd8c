package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("leftAsOf: latest right row at or before left time, per key") {
    import spark.implicits._
    val left = Seq(
      (10L, 1L, 100L), (11L, 1L, 250L), (12L, 2L, 50L), (13L, 3L, 500L)
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (90L, 1L, 100L), (91L, 1L, 200L), (92L, 2L, 60L)
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.leftAsOf(left, right, "user_id", "ts", "event_id",
        Map("event_id" -> "match_id", "ts" -> "match_ts"))
      .orderBy("event_id").collect()
    // 10@100: right 90@100 matches inclusively; 11@250 -> 91@200;
    // 12@50: right 92@60 is later -> null; 13: no right rows for user 3
    assert(out.map(r => Option(r.get(3))).toSeq ==
      Seq(Some(90L), Some(91L), None, None))
    assert(out(1).getLong(4) == 200L)
  }

  test("rangeJoin: inclusive lower, exclusive upper, cross-bucket matches") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    val left = Seq((1L, t(1000000000L))).toDF("id", "ts")
    val right = Seq(
      (10L, t(1000000000L - 600000000L)), // exactly lower bound: included
      (11L, t(1000000000L - 1L)),         // just inside upper: included
      (12L, t(1000000000L)),              // upper bound: excluded
      (13L, t(1000000000L - 600000001L))  // below lower: excluded
    ).toDF("id", "ts")
    val out = RangeJoin.rangeJoin(left, right, "ts", "ts", -600000000L, 0L)
      .select("r_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(10L, 11L))
  }

  test("PrefixSum.runningBefore: exact over many partitions, data never single-partitioned") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val n = 1000
    val df = spark.range(0, n, 1, 16)
      .select(col("id"), ((col("id") * 37 + 11) % 97).as("v"))
    val out = graft.ops.PrefixSum.runningBefore(df.toDF(), "id", "v", partitions = 8)
      .orderBy("id").select("id", "cum_before").as[(Long, Long)].collect()
    var acc = 0L
    (0 until n).foreach { i =>
      assert(out(i) == (i.toLong, acc), s"at id=$i")
      acc += (i.toLong * 37 + 11) % 97
    }
    // the only single-partition exchange allowed is the per-partition
    // offsets frame (8 rows), never the data path
    val plan = graft.ops.PrefixSum.runningBefore(df.toDF(), "id", "v", 8)
      .queryExecution.executedPlan.toString
    assert("Exchange SinglePartition".r.findAllIn(plan).length <= 1, plan.take(2000))
  }

  test("graft_kmv: exact below k, deterministic estimate above k") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftAggregates.register(spark)
    // fewer than k distinct -> exact count (duplicates don't inflate)
    val small = Seq(5L, 7L, 5L, 9L).toDF("h")
      .agg(expr("graft_kmv(h, 4)")).head.getDouble(0)
    assert(small == 3.0)
    // k-th smallest drives the estimate: (k-1) * 2^60 / h_k
    val est = Seq(1L << 50, 1L << 52, 1L << 54, 1L << 56, 1L << 58).toDF("h")
      .agg(expr("graft_kmv(h, 4)")).head.getDouble(0)
    assert(est == 3.0 * KmvSketch.HashSpace / (1L << 56).toDouble)
    // partial/final merge path: many partitions, 37 distinct hashes spaced
    // 2^50 apart; 4th smallest = 3 * 2^50 -> estimate 3 * 2^60 / (3*2^50) = 1024
    val got = spark.range(0, 1000, 1, 8)
      .selectExpr("(id % 37) * 1125899906842624 AS h")
      .agg(expr("graft_kmv(h, 4)")).head.getDouble(0)
    assert(got == 1024.0)
  }

  test("graft_top_k keeps k smallest with struct ordering across partitions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftAggregates.register(spark)
    // (score DESC, id ASC) encoded by the negated leading field
    val rows = Seq((0.9, 1L), (0.5, 2L), (0.95, 3L), (0.99, 7L))
      .toDF("x", "id").repartition(4)
    val top = rows
      .agg(expr("graft_top_k(struct(-x AS s, id AS id, x AS x), 2)").as("t"))
      .selectExpr("transform(t, e -> struct(e.x, e.id)) AS t")
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(r => (r.getDouble(0), r.getLong(1))) == Seq((0.99, 7L), (0.95, 3L)))
    // plans as a codegen-friendly declarative aggregate, not ObjectHashAggregate
    val plan = rows.groupBy("id")
      .agg(expr("graft_top_k(struct(-x AS s, id AS id), 2)"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"), plan.take(1500))
    assert(!plan.contains("AppendColumns"), plan.take(1500))
  }

  test("graft_ivf_cells rejects out-of-range k at plan time") {
    import spark.implicits._
    IvfFunctions.register(spark, Array(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f))))
    val df = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    df.createOrReplaceTempView("ivf_k_probe")
    // valid bound still works
    assert(spark.sql(
      "SELECT graft_ivf_cells(embedding, 2) FROM ivf_k_probe").count() == 1)
    for (bad <- Seq(0, 99)) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT graft_ivf_cells(embedding, $bad) FROM ivf_k_probe").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("k must be in [1, 2]")), e.toString)
    }
  }

  test("frameSampleBatch: stride sampling, offsets, truncated last frame") {
    val bytes = Array.tabulate(70)(_.toByte) // frames of 32: [0,32), [32,64), [64,70)
    val out = Multimodal.frameSampleBatch(Seq((7L, bytes)), frameSize = 32, stride = 2)
    // frames 0 and 2 sampled (stride 2), frame 1 skipped
    assert(out.map(f => (f.frame_id, f.off, f.fr_bytes)) ==
      Seq((0L, 0L, 32), (2L, 64L, 6)))
    assert(out.head.checksum == (0 until 32).sum)
    assert(out(1).checksum == (64 until 70).sum)
    assert(Multimodal.frameSampleBatch(Seq((1L, Array.empty[Byte])), 32, 2).isEmpty)
  }

  test("Tables.memo evaluates a racing thunk exactly once") {
    val cache = scala.collection.concurrent.TrieMap.empty[Int, Int]
    val evals = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        gate.await()
        graft.Tables.memo(cache, 42) { evals.incrementAndGet(); 7 }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(evals.get() == 1)
    assert(cache(42) == 7)
  }
}
