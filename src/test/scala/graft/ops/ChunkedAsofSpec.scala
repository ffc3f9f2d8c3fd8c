package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[AsOfJoin.leftAsOfChunked]] must be OUTPUT-IDENTICAL to
  * [[AsOfJoin.leftAsOf]] — it exists purely as the hot-key parallel
  * escape hatch (the q_asof_join analogue of sessionizeChunked), so any
  * divergence is a bug. Cases target the stitch algebra: matches that
  * cross MANY chunk boundaries (carry-in chains over right-empty
  * chunks), right rows exactly at chunk edges, equal (time) ties broken
  * by the tie column, left rows BEFORE any right row (null match must
  * survive the inner carry join), pre-epoch timestamps (exact floor-div
  * chunks), and a seeded hot-key soup at a chunk count small enough
  * that every chain is multi-chunk.
  */
class ChunkedAsofSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(rows: Seq[(Long, Long, Long)]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (id, us, user) => (id, new Timestamp(us / 1000L), user) }
      .toDF("event_id", "ts", "user_id")
  }

  private def run(
      left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)],
      chunks: Int): Unit = {
    val (l, r) = (df(left), df(right))
    val carry = Map("event_id" -> "m_id", "ts" -> "m_ts")
    def collect(res: org.apache.spark.sql.DataFrame) = res
      .select("event_id", "user_id", "m_id", "m_ts").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getTimestamp(3).getTime)).toSet
    val want = collect(AsOfJoin.leftAsOf(l, r, "user_id", "ts", "event_id", carry))
    val got = collect(
      AsOfJoin.leftAsOfChunked(l, r, "user_id", "ts", "event_id", carry, chunks))
    assert(got == want)
    assert(got.size == left.size, "every left row must survive (left as-of)")
  }

  private val M = 60L * 1000000L // one minute in micros

  test("multi-chunk carry chains, chunk-edge rights, ties, matchless lefts") {
    // right rows for user 1 at minutes 0 and 10; left rows probe minutes
    // 0 (tie: equal ts — inclusive <=), 5, 9, 40 (carry across many
    // right-empty chunks), and user 2 has NO rights (null match); user 3
    // only has a left BEFORE its right (null match despite a later right)
    val right = Seq((100L, 0L * M, 1L), (101L, 10L * M, 1L), (102L, 50L * M, 3L))
    val left = Seq(
      (1L, 0L * M, 1L), (2L, 5L * M, 1L), (3L, 9L * M, 1L),
      (4L, 40L * M, 1L), (5L, 7L * M, 2L), (6L, 49L * M, 3L))
    // chunks = 5 over [0, 50m] → 10-minute-ish chunks: rights land on
    // chunk edges, and left row 4's match is 3 chunks back
    run(left, right, chunks = 5)
  }

  test("equal-time right ties break on the tie column like the window order") {
    // two rights at the same ts for user 7: the (time, side desc, tie)
    // window keeps the LAST in tie order — the chunked summary's
    // max(struct(t, tie, payload)) must agree
    val right = Seq((200L, 10L * M, 7L), (201L, 10L * M, 7L))
    val left = Seq((1L, 10L * M, 7L), (2L, 30L * M, 7L))
    run(left, right, chunks = 3)
  }

  test("pre-epoch timestamps: floor-div chunks partition time") {
    val right = Seq((300L, -90L * M, 9L), (301L, -30L * M, 9L))
    val left = Seq(
      (1L, -95L * M, 9L), // before any right: null
      (2L, -60L * M, 9L), // matches -90m across the epoch-negative grid
      (3L, 30L * M, 9L))  // matches -30m across epoch
    run(left, right, chunks = 4)
  }

  test("null keys and null times equal the plain operator (null-safe stitch)") {
    // r17 (verdict r16 advice): nulls group together under window
    // partitioning and a null time orders first — the chunked stitch
    // must reproduce exactly that, not drop the rows on an inner join.
    val spark2 = spark
    import spark2.implicits._
    def ndf(rows: Seq[(Long, Option[Long], Option[Long])]) =
      rows.map { case (id, us, user) =>
        (id, us.map(u => new Timestamp(u / 1000L)).orNull,
          user.map(Long.box).orNull)
      }.toDF("event_id", "ts", "user_id")
    val right = ndf(Seq(
      (100L, Some(0L * M), Some(1L)),
      (101L, Some(10L * M), None),        // null-key right
      (102L, None, Some(1L)),             // null-time right (orders first)
      (103L, None, None)))                // null-key AND null-time right
    val left = ndf(Seq(
      (1L, Some(5L * M), Some(1L)),       // normal match
      (2L, Some(20L * M), None),          // null-key left → null-key right
      (3L, None, Some(1L)),               // null-time left → null-time right
      (4L, None, None),                   // both null → row 103
      (5L, Some(1L * M), Some(2L))))      // matchless
    val carry = Map("event_id" -> "m_id")
    def collect(res: org.apache.spark.sql.DataFrame) = res
      .select("event_id", "user_id", "m_id").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) -1L else x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    val want = collect(AsOfJoin.leftAsOf(left, right, "user_id", "ts", "event_id", carry))
    val got = collect(
      AsOfJoin.leftAsOfChunked(left, right, "user_id", "ts", "event_id", carry, 4))
    assert(got == want)
    assert(got.size == 5, "every left row must survive, including null key/time rows")
  }

  test("seeded hot-key soup equals the plain operator") {
    val rnd = new scala.util.Random(1717)
    val right = (0 until 300).map { i =>
      val user = if (rnd.nextInt(4) == 0) 5L else rnd.nextInt(20).toLong + 10L
      (1000L + i, (rnd.nextInt(5000).toLong - 1000L) * M / 10L, user)
    }
    val left = (0 until 500).map { i =>
      val user = if (rnd.nextInt(3) == 0) 5L else rnd.nextInt(25).toLong + 10L
      (5000L + i, (rnd.nextInt(5000).toLong - 1000L) * M / 10L, user)
    }
    run(left, right, chunks = 7)
  }
}
