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

  test("KmvAgg: exact below k, deterministic estimate above k") {
    val agg = new KmvAgg(4)
    // fewer than k distinct -> exact count
    val small = Seq(5L, 7L, 5L, 9L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(small) == 3.0)
    // k-th smallest drives the estimate: (k-1) * 2^60 / h_k
    val hs = Seq(1L << 50, 1L << 52, 1L << 54, 1L << 56, 1L << 58)
    val buf = hs.foldLeft(agg.zero)(agg.reduce)
    assert(buf == hs.take(4).sorted)
    assert(agg.finish(buf) == 3.0 * KmvAgg.HashSpace / (1L << 56).toDouble)
    // merge respects distinctness and the cap
    val merged = agg.merge(buf, Seq(1L << 50, 1L << 49))
    assert(merged == Seq(1L << 49, 1L << 50, 1L << 52, 1L << 54))
  }

  test("TopKAgg keeps k smallest with ordering and merge") {
    implicit val ord: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])
    implicit val enc = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Double, Long)]]()
    val agg = new TopKAgg[(Double, Long)](2)
    val b = Seq((0.9, 1L), (0.5, 2L), (0.95, 3L)).foldLeft(agg.zero)(agg.reduce)
    assert(b == Seq((0.95, 3L), (0.9, 1L)))
    assert(agg.merge(b, Seq((0.99, 7L))) == Seq((0.99, 7L), (0.95, 3L)))
  }
}
