package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join — for each left row, the latest right row with
  * `right.time <= left.time` in the same key group — an operator Spark
  * lacks natively (SURVEY.md §4 custom-operator tier; DuckDB ships it as
  * ASOF JOIN, which is exactly what the oracle uses).
  *
  * Implemented as the scalable union + ordered-window-carry pattern: tag
  * both sides, union, and carry the last right-side payload forward
  * within each key ordered by (time, right-first, tie). One shuffle on
  * the key, no per-row range probe, no interval explosion — at 100 TB
  * this is a single sort-based exchange partitioned by a high-cardinality
  * key, which beats both a range cross-join and a per-key collect.
  */
object AsOfJoin {

  /** @param carry right-side columns to attach to matching left rows
    *              (packed into one struct internally so they always come
    *              from the SAME right row, even when some are null).
    * @param tie   unique-per-row column present on both sides; breaks
    *              ordering ties deterministically.
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      tie: String,
      carry: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(carry.keys.toSeq.map(col): _*)
    val l2 = left.select(
      col(key), col(time), col(tie), lit(0).as("_side"),
      lit(null).cast(right.select(payload).schema.head.dataType).as("_carry"),
      struct(leftCols.map(col): _*).as("_row"))
    val r2 = right.select(
      col(key), col(time), col(tie), lit(1).as("_side"),
      payload.as("_carry"), lit(null).cast(l2.schema("_row").dataType).as("_row"))
    // right rows sort before left rows at equal time => inclusive (<=)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side").desc, col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l2.union(r2)
      .withColumn("_match", last(col("_carry"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
    val out = leftCols.map(c => col(s"_row.$c").as(c)) ++
      carry.map { case (src, as) => col(s"_match.$src").as(as) }
    carried.select(out: _*)
  }

  /** Measured plain-vs-chunked as-of crossover on local[32] (r17,
    * verdict r16 item 3; SCALE.md stream-skew wave, r16 re-run): with
    * the planted 20%-hot user the plain carry wins at x25 (hot key 500k
    * rows across both sides, 1.72 vs 1.82 s) and loses at x50 (1M rows,
    * 3.27 vs 2.12 s) — its per-key window sort is the serial chain. The
    * default sits in the measured gap; a wide cluster moves the true
    * crossover down (the chunked branch parallelizes, the hot-key sort
    * does not), so cluster callers may pass a lower threshold.
    */
  val AsofCrossoverRows: Long = 750000L

  /** Strategy selector over [[leftAsOf]] / [[leftAsOfChunked]] (r17,
    * verdict r16 item 3): output-identical branches (ChunkedAsofSpec),
    * chosen on the largest single key's MERGED row count (left + right —
    * the union window sorts both sides together), one bounded
    * diagnostic aggregate via [[graft.ops.Skew.maxGroupRows]]. Both
    * branches pinned in StrategySelectorSpec. Like [[leftAsOfChunked]],
    * requires a timestamp `time` column.
    */
  def leftAsOfAuto(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      tie: String,
      carry: Map[String, String],
      chunks: Int = 64,
      crossoverRows: Long = AsofCrossoverRows): DataFrame = {
    val merged = left.select(col(key).as("__k"))
      .union(right.select(col(key).as("__k")))
    // total rows bound any merged key group — see sessionizeAuto
    if (merged.count() < crossoverRows)
      leftAsOf(left, right, key, time, tie, carry)
    else if (Skew.maxGroupRows(merged, Seq(col("__k"))) >= crossoverRows)
      leftAsOfChunked(left, right, key, time, tie, carry, chunks)
    else
      leftAsOf(left, right, key, time, tie, carry)
  }

  /** [[leftAsOf]] with a (key, time-chunk) pre-key — the hot-key escape
    * hatch (r16, the q_asof_join analogue of
    * `EventStreams.sessionizeChunked`, closing the SCALE.md "documented
    * only" residual): the plain operator's per-key ordered carry puts a
    * hot key's ENTIRE merged event stream through one window task. This
    * variant is EXACT (ChunkedAsofSpec pins it against [[leftAsOf]]
    * incl. boundary ties, pre-epoch timestamps, and matchless rows) and
    * has no single-key event-sized chain:
    *
    *  1. chunk = floor(time / width), width from one bounded global
    *     min/max aggregate over both sides (exact floor division — the
    *     stitch needs chunks to PARTITION time, any width works for
    *     correctness since the carry-in covers arbitrary distances);
    *  2. the union-carry window runs per (KEY, CHUNK) — the hot key
    *     splits across the chunk grid; a left row's local match is the
    *     last right row at-or-before it WITHIN its chunk;
    *  3. per-(key, chunk) summaries: each chunk's LAST right payload
    *     (max by (time, tie) — the window order restricted to right
    *     rows). Left-side (key, chunk) entries union in with null
    *     summaries, ordered AHEAD of same-chunk summaries, so one
    *     running last-non-null pass per key over the SUMMARY frame
    *     (rows per nonempty chunk, not per event) yields each chunk's
    *     carry-in = the last right payload of any STRICTLY EARLIER
    *     chunk;
    *  4. match = coalesce(local, carry-in) — exact because time chunks
    *     partition time: a local match always postdates every prior
    *     chunk's rows.
    *
    * `time` must be a timestamp column (the chunk grid reads
    * unix_micros); [[leftAsOf]] itself stays type-generic. Null keys and
    * null times are supported and match [[leftAsOf]] exactly (nulls
    * group together, and a null time orders first — the null chunk is
    * the earliest chunk): the stitch join is null-safe, never dropping
    * a left row (verdict r16 advice; ChunkedAsofSpec null cases).
    */
  def leftAsOfChunked(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      tie: String,
      carry: Map[String, String],
      chunks: Int = 64): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(carry.keys.toSeq.map(col): _*)
    val tsUs = (c: Column) => unix_micros(c)
    val bounds = left.select(tsUs(col(time)).as("t"))
      .union(right.select(tsUs(col(time)).as("t")))
      .agg(min("t"), max("t")).head()
    if (bounds.isNullAt(0))
      return leftAsOf(left, right, key, time, tie, carry)
    val lo = bounds.getLong(0)
    val width = math.max((bounds.getLong(1) - lo) / chunks + 1, 1L)
    // exact floor division via integer DIV (numerator ≥ 0 by construction
    // of lo, so truncation == floor) — Column./ is DOUBLE division, which
    // only rounds correctly below ~2^53 µs spans; this matches
    // EventStreams.arrivalHighWaterMark's grid arithmetic. A null time
    // yields a null chunk, handled by the null-safe stitch below.
    val chunkCol: Column = expr(s"(unix_micros(`$time`) - ${lo}L) DIV ${width}L")

    val l2 = left.select(
      col(key), col(time), col(tie), lit(0).as("_side"),
      lit(null).cast(right.select(payload).schema.head.dataType).as("_carry"),
      struct(leftCols.map(col): _*).as("_row"))
      .withColumn("_chunk", chunkCol)
    val r2 = right.select(
      col(key), col(time), col(tie), lit(1).as("_side"),
      payload.as("_carry"), lit(null).cast(l2.schema("_row").dataType).as("_row"))
      .withColumn("_chunk", chunkCol)
    val wLocal = Window.partitionBy(col(key), col("_chunk"))
      .orderBy(col(time), col("_side").desc, col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l2.union(r2)
      .withColumn("_local", last(col("_carry"), ignoreNulls = true).over(wLocal))

    // summary stream: right chunks carry their last payload (max by
    // (time, tie) — tie is unique per row, so the struct max equals the
    // window-order last); left chunks enter with null. _entry = 0 sorts
    // left entries BEFORE same-chunk summaries, so the exclusive-prefix
    // last-non-null below reads only STRICTLY EARLIER chunks' payloads.
    val rSum = r2.groupBy(col(key), col("_chunk"))
      .agg(max(struct(tsUs(col(time)).as("_t"), col(tie).as("_tb"),
        col("_carry").as("_p"))).as("_m"))
      .select(col(key), col("_chunk"), lit(1).as("_entry"),
        col("_m._p").as("_sum"))
    val lEntries = l2.select(col(key), col("_chunk")).distinct()
      .select(col(key), col("_chunk"), lit(0).as("_entry"),
        lit(null).cast(rSum.schema("_sum").dataType).as("_sum"))
    val wCarry = Window.partitionBy(col(key))
      .orderBy(col("_chunk"), col("_entry"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = rSum.union(lEntries)
      .withColumn("_in", last(col("_sum"), ignoreNulls = true).over(wCarry))
      .filter(col("_entry") === 0)
      .select(col(key), col("_chunk"), col("_in"))

    // STRUCT-level coalesce: a local match whose payload FIELD is null
    // must still win over the carry-in (field-level coalesce would leak
    // the earlier row's field into the later match)
    val out = leftCols.map(c => col(s"_row.$c").as(c)) ++
      carry.map { case (src, as) => col(s"_match.$src").as(as) }
    // NULL-SAFE LEFT stitch (verdict r16 advice): a null key or null time
    // (⇒ null chunk) must not drop the left row the way a plain inner
    // equi-join would. Window partitioning groups nulls together on both
    // the local and summary frames, and the carry ordering puts the null
    // chunk FIRST (nulls-first ascending) — exactly where leftAsOf's
    // nulls-first time order puts null-time rows — so the <=> join keeps
    // the chunked output identical to leftAsOf for null keys and times
    // too (pinned in ChunkedAsofSpec's null cases).
    val carryNamed = carryIn
      .withColumnRenamed(key, "_ck").withColumnRenamed("_chunk", "_cc")
    merged.filter(col("_side") === 0)
      .join(carryNamed,
        col(key) <=> col("_ck") && col("_chunk") <=> col("_cc"), "left")
      .withColumn("_match", coalesce(col("_local"), col("_in")))
      .select(out: _*)
  }
}
