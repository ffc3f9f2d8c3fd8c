package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Event-stream transforms written once and usable in BOTH batch and
  * Structured Streaming mode (the same DataFrame expressions plan either
  * way). The reference has no streaming surface (SURVEY.md §2 notes);
  * this is the engine's forward-looking path: file/Kafka `readStream` →
  * these transforms → `writeStream`, with event-time watermarks bounding
  * state.
  */
object EventStreams extends Serializable {

  final case class Event(event_id: Long, ts_us: Long, user_id: Long, value: java.math.BigDecimal)
  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long, total_value: Double)

  /** Tumbling event-time window aggregate with a watermark. On a stream
    * the watermark bounds state and admits late data up to 30 minutes; on
    * a batch frame it is a no-op and the result is the plain windowed
    * aggregate. Sums use exact decimals so results are order-independent.
    */
  def windowedAgg(events: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stream-static dimension enrichment — the most common streaming
    * pattern: every micro-batch of the (unbounded) event stream joins
    * against a bounded dimension table. The static side is explicitly
    * broadcast, so the stream is NEVER shuffled for the join (map-side
    * hash join per micro-batch) and no streaming state accumulates —
    * stateless, so any output mode works and no watermark is required.
    * LEFT join: an event with no dimension row survives with NULLs
    * (dropping events because a dim is late-loaded is a pipeline bug).
    * On a batch frame the same plan is the ordinary broadcast join.
    * At 100 TB of stream the dim must stay broadcast-sized; a
    * data-sized "dimension" is a stream-stream join problem instead
    * (see [[attributionJoin]]).
    */
  def enrichStatic(
      events: DataFrame,
      dim: DataFrame,
      eventKey: String,
      dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  /** Watermark-delay audit → recommendation (the q_stream_late feedback
    * loop). Replays a batch of the stream in ARRIVAL order, measures each
    * event's event-time lag behind the running high-water mark per
    * partition key, and returns the maximum rounded UP to whole seconds —
    * the smallest `withWatermark` delay that would have admitted every
    * observed event. Partitioned like the audit query (running max within
    * each key's arrival sequence), so no single global sort at scale; at
    * 100 TB this runs over a bounded recent sample, not the full history.
    */
  def recommendedWatermarkDelay(
      events: DataFrame,
      arrivalCol: String,
      partitionCols: Seq[String] = Seq("event_type")): String = {
    import org.apache.spark.sql.expressions.Window
    val w = (if (partitionCols.isEmpty) Window.partitionBy(lit(1))
             else Window.partitionBy(partitionCols.map(col): _*))
      .orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tsu = unix_micros(col("ts"))
    val maxLagUs = events
      .withColumn("__lag_us", max(tsu).over(w) - tsu)
      .agg(max(col("__lag_us")))
      .head().getLong(0)
    val secs = (maxLagUs + 999999L) / 1000000L
    s"$secs seconds"
  }

  /** Gap-based sessionization via the typed state API.
    *
    * Batch (`emitOpenSessions = true`, the oracle-checked mode): each
    * group is invoked once with empty state and every session — including
    * the trailing one — is emitted, matching the SQL gaps-and-islands
    * formulation exactly.
    *
    * Streaming (`emitOpenSessions = false`): only sessions CLOSED by a
    * gap are emitted; the open trailing session stays in state so events
    * arriving in later micro-batches extend it instead of fragmenting
    * it. A session closes when a later event of the same user exceeds
    * the gap (idle-user flushing would use a state timeout; left out
    * because continuous empty timeout-check batches are wasteful for
    * this workload shape).
    */
  def sessionize(
      spark: SparkSession,
      events: DataFrame,
      gapMinutes: Int = 30,
      emitOpenSessions: Boolean = true): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000L
    val typed = events.select(
      col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"),
      col("value").cast(DecimalType(18, 4)).as("value")).as[Event]

    def flush(
        userId: Long,
        it: Iterator[Event],
        state: GroupState[List[Event]]): Iterator[Session] = {
      val all = (state.getOption.getOrElse(Nil) ++ it).sortBy(e => (e.ts_us, e.event_id))
      if (all.isEmpty) return Iterator.empty
      val sessions = Seq.newBuilder[Session]
      var cur = List(all.head)
      all.tail.foreach { e =>
        if (e.ts_us - cur.head.ts_us > gapUs) { sessions += toSession(userId, cur.reverse); cur = List(e) }
        else cur = e :: cur
      }
      if (emitOpenSessions) {
        sessions += toSession(userId, cur.reverse)
        state.remove()
      } else {
        state.update(cur.reverse)
      }
      sessions.result().iterator
    }

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(flush)
  }

  /** Batch-parallel gap sessionization with a (user, time-chunk)
    * pre-key — the measured escape hatch for the stream-skew wave's
    * hot-user serial chain (SCALE.md): [[sessionize]]'s batch replay
    * funnels a user's ENTIRE history through one
    * flatMapGroupsWithState group, so a key holding 20% of all events
    * serializes 20% of the corpus on one core. This variant is EXACT
    * (ChunkedSessionizeSpec pins it against [[sessionize]] including
    * boundary gaps and multi-chunk chains) and fully parallel:
    *
    *  1. chunk = ts DIV gap. Chunk width ≥ gap means a session can
    *     never span an EMPTY chunk (the jump would exceed the gap), so
    *     sessions only ever stitch across consecutive NONEMPTY chunk
    *     summaries.
    *  2. local session ids per (user, chunk) window — the hot user's
    *     million events split across thousands of independent chunk
    *     partitions.
    *  3. one per-user pass over the CHUNK SUMMARIES (a few rows per
    *     chunk, not per event): a chunk's first local session merges
    *     with the previous summary's last session iff the boundary gap
    *     is ≤ gap; global id = base + local − merge where base is the
    *     running sum of (n_local − merge) over prior chunks — merge
    *     CHAINS collapse because a single-session bridging chunk
    *     contributes n_local − merge = 0 to base.
    *  4. per-(user, global id) aggregate — exact decimal sums, one
    *     double conversion, identical to the typed path's arithmetic.
    */
  def sessionizeChunked(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMinutes.toLong * 60 * 1000000L
    val ev = events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("value").cast(DecimalType(18, 4)).as("value"))
      .withColumn("chunk", expr(s"ts_us DIV ${gapUs}L"))
    val wChunk = Window.partitionBy("user_id", "chunk")
      .orderBy("ts_us", "event_id")
    val local = ev
      .withColumn("prev_ts", lag("ts_us", 1).over(wChunk))
      .withColumn("brk",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("lsid", sum("brk").over(
        wChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // LOCAL SESSION pre-aggregation: everything after the one per-event
    // window pass runs over session-level frames. The groupBys on
    // (user, chunk, lsid) and (user, chunk) both ride the window's
    // (user, chunk) partitioning — no further event-sized exchange —
    // and the stitch join carries local sessions, not events.
    val localSess = local.groupBy("user_id", "chunk", "lsid")
      .agg(min("ts_us").as("s_start"), max("ts_us").as("s_end"),
        count(lit(1)).as("s_n"), sum("value").as("s_v"))
    val wUser = Window.partitionBy("user_id").orderBy("chunk")
    val summaries = localSess.groupBy("user_id", "chunk")
      .agg(min("s_start").as("first_ts"), max("s_end").as("last_ts"),
        max("lsid").as("n_local"))
      .withColumn("merge",
        when(col("first_ts") - lag("last_ts", 1).over(wUser) <= gapUs, 1L)
          .otherwise(0L))
      .withColumn("base", coalesce(
        sum(col("n_local") - col("merge"))
          .over(wUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("user_id", "chunk", "merge", "base")
    localSess.join(summaries, Seq("user_id", "chunk"))
      .withColumn("gsid", col("base") + col("lsid") - col("merge"))
      .groupBy("user_id", "gsid")
      .agg(min("s_start").as("start_us"), max("s_end").as("end_us"),
        sum("s_n").as("n_events"),
        sum("s_v").cast(DoubleType).as("total_value"))
      .drop("gsid")
  }

  /** Streaming exact dedup for continuous ingest: first-seen wins on the
    * content fingerprint, with state maintained across micro-batches by
    * `dropDuplicates`. The batch analogue with a DETERMINISTIC keeper
    * (min doc id per fingerprint) is `q_dedup_exact`; on a stream,
    * "first" is arrival order — exactly the semantics a training-data
    * ingest pipeline wants. Pass a watermark column + delay to bound the
    * fingerprint state for unbounded streams (state is then dropped for
    * fingerprints older than the watermark — late duplicates beyond the
    * delay would be re-admitted, the standard streaming dedup trade).
    */
  def dedupFirstSeen(
      docs: DataFrame,
      textCol: String = "text",
      watermark: Option[(String, String)] = None): DataFrame =
    dedupFirstSeenBy(docs, md5(lower(col(textCol))), watermark)

  /** [[dedupFirstSeen]] generalized to an arbitrary fingerprint column
    * (e.g. a composite business key for event streams).
    */
  def dedupFirstSeenBy(
      df: DataFrame,
      fingerprint: org.apache.spark.sql.Column,
      watermark: Option[(String, String)] = None): DataFrame = {
    val fp = df.withColumn("fp", fingerprint)
    val out = watermark match {
      // dropDuplicatesWithinWatermark rejects batch frames outright
      // (streaming-only API), so batch mode runs the same First-aggregate
      // dedup via dropDuplicates — identical keep-first semantics, minus
      // the state-expiry bound that only exists on a stream.
      case Some((c, delay)) if df.isStreaming =>
        fp.withWatermark(c, delay).dropDuplicatesWithinWatermark("fp")
      case _ => fp.dropDuplicates("fp")
    }
    out.drop("fp")
  }

  /** Stream-stream interval join: attribute each purchase to every view
    * by the same user within the preceding `windowMinutes`.
    *
    * This is THE canonical Structured Streaming join shape: watermarks on
    * BOTH inputs plus a bounded event-time condition are exactly what
    * lets the engine expire join state (a view older than the watermark
    * minus the window can never match a future purchase, so its buffer
    * row is dropped). Without either bound, stream-stream inner join
    * state grows forever.
    *
    * BATCH replay (r15 stream-skew wave finding): the identical
    * user-only equi-join is NOT scale-safe in batch mode. A stream
    * matches each arriving purchase against only the views the
    * watermark keeps buffered (~window-worth per user), so a hot user
    * costs output; the batch equi-join on user_id alone puts the hot
    * user's ENTIRE history on one sort-merge key and cross-products it
    * before the range filter — the r15 probe's 20%-hot-user corpus ran
    * a 200k × 200k single-task key group at x50 (10^10 comparisons,
    * hours). Batch mode therefore joins on (user, 30-min time bucket)
    * with each purchase probing its own and the previous bucket — the
    * ops/RangeJoin grid idiom with a user pre-key: any view within
    * [p_ts − w, p_ts] lies in one of the two buckets (bucket width =
    * w), each pair matches in exactly ONE bucket (a view has one
    * bucket), and the exact range filter keeps semantics identical —
    * so per-key group size is the user's per-window density, never
    * their history.
    */
  def attributionJoin(
      views: DataFrame,
      purchases: DataFrame,
      windowMinutes: Int = 30,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val v = views.select(
        col("event_id").as("view_id"), col("ts").as("v_ts"),
        col("user_id").as("v_user"))
      .withWatermark("v_ts", watermarkDelay)
    val p = purchases.select(
        col("event_id").as("purchase_id"), col("ts").as("p_ts"),
        col("user_id").as("user_id"))
      .withWatermark("p_ts", watermarkDelay)
    val rangeCond =
      col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $windowMinutes MINUTES")
    val joined =
      if (views.isStreaming || purchases.isStreaming)
        v.join(p, col("v_user") === col("user_id") && rangeCond)
      else {
        val wUs = windowMinutes * 60L * 1000000L
        val vb = v.withColumn("vtb", expr(s"unix_micros(v_ts) DIV ${wUs}L"))
        val pb = p.withColumn("ptb",
          explode(array(expr(s"unix_micros(p_ts) DIV ${wUs}L"),
            expr(s"unix_micros(p_ts) DIV ${wUs}L - 1L"))))
        // (user, bucket) is the equi-join key; the range condition rides
        // along and Catalyst plans one hash/sort join on both columns
        vb.join(pb,
            col("v_user") === col("user_id") && col("vtb") === col("ptb") &&
              rangeCond)
          .drop("vtb", "ptb")
      }
    joined.select(col("purchase_id"), col("view_id"), col("user_id"),
      (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("lag_us"))
  }

  /** Batch replay of the streaming first-seen semantics with arrival
    * order pinned to event order: repartition by fingerprint (all rows
    * of a key in one task, like the streaming state partitioning) and
    * sort within partitions by `orderCols`, so the row
    * `dropDuplicatesWithinWatermark` keeps is the event-time-first one —
    * deterministically, which is what lets the batch run earn a
    * hash-exact oracle row while executing the SAME dedup operator the
    * stream uses (`withWatermark` + `dropDuplicatesWithinWatermark` are
    * arrival-order no-ops on a batch frame). First-aggregates are
    * order-sensitive, so Catalyst keeps the within-partition sort below
    * the dedup aggregate (EliminateSorts only removes sorts under
    * order-irrelevant aggregates).
    */
  def dedupFirstSeenBatchOrdered(
      df: DataFrame,
      fingerprint: org.apache.spark.sql.Column,
      orderCols: Seq[String],
      watermark: Option[(String, String)] = None): DataFrame = {
    val arranged = df.withColumn("fpk", fingerprint)
      .repartition(col("fpk"))
      .sortWithinPartitions(orderCols.map(col): _*)
    dedupFirstSeenBy(arranged, col("fpk"), watermark).drop("fpk")
  }

  private def toSession(userId: Long, events: List[Event]): Session = {
    val total = events.map(_.value).foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    Session(userId, events.head.ts_us, events.last.ts_us, events.length.toLong, total.doubleValue())
  }
}
