package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The hot-key strategy selectors (r17, verdict r16 item 3) must
  * (a) pick the typed/plain branch below the crossover and the
  * chunked/aggregate branch at or above it — pinned by plan shape, the
  * only observable difference between output-identical branches — and
  * (b) produce the branch-identical rows either way. The crossover
  * thresholds themselves come from the stream-skew wave (SCALE.md);
  * here they are overridden so both branches fire on a small corpus.
  */
class StrategySelectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val M = 60L * 1000000L

  private def events: DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(42)
    (0 until 300).map { i =>
      val user = if (i % 3 == 0) 1L else rnd.nextInt(10).toLong + 2L
      val typ = Seq("view", "purchase", "signup")(rnd.nextInt(3))
      (i.toLong, new Timestamp(rnd.nextInt(600).toLong * M / 1000L),
        user, typ, BigDecimal(rnd.nextInt(1000)) / 100)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  private def plan(df: DataFrame): String = df.queryExecution.analyzed.toString

  test("sessionizeAuto picks typed below and chunked above the crossover") {
    val ev = events
    val typed = EventStreams.sessionizeAuto(spark, ev, 30, crossoverRows = Long.MaxValue)
    val chunked = EventStreams.sessionizeAuto(spark, ev, 30, crossoverRows = 1L)
    // the typed state path is a FlatMapGroupsWithState plan; the chunked
    // path is pure relational algebra over the chunk grid
    assert(plan(typed).contains("FlatMapGroupsWithState"))
    assert(!plan(chunked).contains("FlatMapGroupsWithState"))
    assert(plan(chunked).contains("chunk"))
    def rows(df: DataFrame) = df
      .select("user_id", "start_us", "end_us", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), math.round(r.getDouble(4) * 10000))).toSet
    assert(rows(typed) == rows(chunked))
    assert(rows(typed).nonEmpty)
  }

  test("sessionizeAuto on a STREAM skips the diagnostic and stays typed-streaming") {
    // the skew diagnostic is a batch job — on a streaming frame the
    // selector must route straight to the typed state path in streaming
    // mode (gap-closed sessions only) instead of throwing at head()
    val spark2 = spark
    import spark2.implicits._
    implicit val sc = spark2.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, Long, Double)]
    val streamDf = mem.toDF().toDF("event_id", "ts", "user_id", "value")
    val auto = EventStreams.sessionizeAuto(spark, streamDf, 30, crossoverRows = 1L)
    assert(auto.isStreaming)
    assert(plan(auto).contains("FlatMapGroupsWithState"))
  }

  test("dedupFirstSeenAuto picks the ordered replay below and the aggregate above") {
    val ev = events
    val fp = md5(concat_ws("|", col("user_id"), col("event_type")))
    val ordered = EventStreams.dedupFirstSeenAuto(
      ev, fp, Seq("ts", "event_id"), crossoverRows = Long.MaxValue)
    val agg = EventStreams.dedupFirstSeenAuto(
      ev, fp, Seq("ts", "event_id"), crossoverRows = 1L)
    // the ordered replay repartitions by the fingerprint; the aggregate
    // path is ONE min_by and never repartitions
    assert(plan(ordered).contains("RepartitionByExpression"))
    assert(!plan(agg).contains("RepartitionByExpression"))
    assert(plan(agg).contains("min_by"))
    def rows(df: DataFrame) = df.select("event_id").collect()
      .map(_.getLong(0)).toSet
    assert(rows(ordered) == rows(agg))
    assert(rows(ordered).nonEmpty)
  }

  test("leftAsOfAuto picks plain below and chunked above the crossover") {
    val ev = events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select("event_id", "user_id", "ts")
    val carry = Map("event_id" -> "signup_id")
    val plain = graft.ops.AsOfJoin.leftAsOfAuto(
      purchases, signups, "user_id", "ts", "event_id", carry,
      crossoverRows = Long.MaxValue)
    val chunked = graft.ops.AsOfJoin.leftAsOfAuto(
      purchases, signups, "user_id", "ts", "event_id", carry,
      chunks = 5, crossoverRows = 1L)
    // the chunked plan carries the _chunk grid attribute; the plain
    // window plan has no chunk anywhere
    assert(!plan(plain).contains("_chunk"))
    assert(plan(chunked).contains("_chunk"))
    def rows(df: DataFrame) = df.select("event_id", "signup_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows(plain) == rows(chunked))
    assert(rows(plain).size == purchases.count())
  }
}
