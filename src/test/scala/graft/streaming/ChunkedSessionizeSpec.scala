package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[EventStreams.sessionizeChunked]] must be OUTPUT-IDENTICAL to the
  * typed [[EventStreams.sessionize]] path (the streaming operator's
  * batch replay) — it exists purely as the parallel escape hatch for
  * hot user keys, so any divergence is a bug. Cases target the stitch
  * algebra: exact-gap boundaries (≤ gap continues, > gap breaks),
  * sessions chaining across MANY chunk boundaries (including chunks
  * that contribute a single bridging session, whose base contribution
  * must be zero), empty chunks between events (never stitched, since
  * chunk width = gap), duplicate timestamps, and a seeded random soup
  * over a hot key.
  */
class ChunkedSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val GapMin = 30
  private val GapUs = GapMin.toLong * 60 * 1000000L

  private def run(events: Seq[(Long, Long, Long, Double)]): Unit = {
    val spark2 = spark
    import spark2.implicits._
    val df = events.map { case (id, us, user, v) =>
      (id, new Timestamp(us / 1000L), user, java.math.BigDecimal.valueOf(v))
    }.toDF("event_id", "ts", "user_id", "value")
    val want = EventStreams.sessionize(spark, df, GapMin).collect()
      .map(s => (s.user_id, s.start_us, s.end_us, s.n_events, s.total_value))
      .toSet
    val got = EventStreams.sessionizeChunked(df, GapMin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("exact-gap boundaries: <= gap continues, > gap breaks, across chunk edges") {
    // user 1: a chain at EXACTLY gap intervals spanning 6 chunks — one
    // session; user 2: gap+1us jumps — every event its own session;
    // user 3: events 1us before/after a chunk edge, within gap
    val ev = (0 to 5).map(i => (10L + i, i.toLong * GapUs, 1L, 1.0)) ++
      (0 to 3).map(i => (20L + i, i.toLong * (GapUs + 1L), 2L, 1.0)) ++
      Seq((30L, GapUs - 1L, 3L, 2.5), (31L, GapUs + 1L, 3L, 0.5),
        (32L, 3L * GapUs, 3L, 1.0))
    run(ev)
  }

  test("single-session bridging chunks collapse merge chains") {
    // user 9's events sit one per chunk at exactly-gap strides: every
    // chunk summary has n_local = 1, merge = 1 after the first — the
    // base arithmetic must keep ONE global id through the whole chain
    val ev = (0 to 19).map(i => (100L + i, 500L + i.toLong * GapUs, 9L, 0.1)) ++
      // then a > gap break and a second chain
      (0 to 4).map(i => (200L + i, 500L + 25L * GapUs + i.toLong * GapUs, 9L, 0.2))
    run(ev)
  }

  test("duplicate timestamps and empty chunks") {
    val ev = Seq(
      (1L, 1000L, 5L, 1.0), (2L, 1000L, 5L, 2.0), (3L, 1000L, 5L, 3.0),
      // 3 empty chunks later — a new session even though each hop is
      // the minimum representable break
      (4L, 1000L + 4L * GapUs, 5L, 4.0),
      (5L, 1000L + 4L * GapUs, 5L, 5.0))
    run(ev)
  }

  test("pre-epoch timestamps: floor-div chunks keep one-session-per-chunk") {
    // r16 (verdict r15 advice): with TRUNCATING division, chunk 0 would
    // span (−gap, +gap) — two events 2·gap−2ms apart would share it and
    // the one-session-per-chunk simplification would wrongly merge
    // them. Exact floor division keeps every chunk gap-wide:
    //  - user 21: ±(gap−1ms) around the epoch — > gap apart, MUST break;
    //  - user 22: ±1ms around the epoch — ≤ gap, must merge across the
    //    chunk −1 / chunk 0 boundary;
    //  - user 23: a chain at exact-gap strides entirely pre-epoch.
    val ev = Seq(
      (40L, -(GapUs - 1000L), 21L, 1.0), (41L, GapUs - 1000L, 21L, 2.0),
      (42L, -1000L, 22L, 3.0), (43L, 1000L, 22L, 4.0)) ++
      (0 to 4).map(i => (50L + i, -10L * GapUs + i.toLong * GapUs, 23L, 0.5))
    run(ev)
    // shape pin (the typed path would mask a silent merge symmetrically):
    // user 21 yields TWO sessions, user 22 ONE
    val spark2 = spark
    import spark2.implicits._
    val df = ev.map { case (id, us, user, v) =>
      (id, new java.sql.Timestamp(us / 1000L), user, java.math.BigDecimal.valueOf(v))
    }.toDF("event_id", "ts", "user_id", "value")
    val got = EventStreams.sessionizeChunked(df, GapMin).collect()
    assert(got.count(_.getLong(0) == 21L) == 2)
    assert(got.count(_.getLong(0) == 22L) == 1)
  }

  test("seeded random soup with a hot key equals the typed path") {
    val rnd = new scala.util.Random(4242)
    val ev = (0 until 4000).map { i =>
      val user = if (rnd.nextInt(5) == 0) 7L else rnd.nextInt(40).toLong + 100L
      val us = math.abs(rnd.nextLong() % (200L * GapUs))
      (i.toLong, us, user, (rnd.nextInt(1000) + 1) / 100.0)
    }
    run(ev)
  }
}
