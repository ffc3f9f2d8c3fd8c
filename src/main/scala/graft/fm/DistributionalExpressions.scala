package graft.fm

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, DeclarativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** DuckDB's distributional aggregates and series generators, available to
  * passthrough SQL via the reference's verbatim `query` surface
  * (`query.py:72` hands user SQL to a DuckDB connection where
  * `quantile_cont` / `quantile_disc` / `median` / `histogram` /
  * `product` / `generate_series` / `range` are built in).
  *
  * Semantics pinned against DuckDB 1.0.0 (DistributionalSpec + the
  * `dist_agg`/`series_fns` fuzz families):
  *  - `quantile_cont(x, q)`: linear interpolation at 0-based position
  *    `q * (n-1)` over the sorted multiset; DOUBLE for numeric input,
  *    TIMESTAMP for DATE/TIMESTAMP input (dates interpolate to
  *    midpoints); VARCHAR input is a binder error in both engines.
  *  - `quantile_disc(x, q)` (alias `quantile`): the element at 1-based
  *    rank `max(1, ceil(q*n))` — equivalently the smallest value whose
  *    cume_dist >= q — for ANY ordering-capable type (Spark's own
  *    percentile_disc coerces to DOUBLE, hence this implementation).
  *  - negative q indexes from the end (DuckDB accepts [-1, 1]):
  *    cont(-q) = cont(1+q) exactly; disc(-q) = rank `floor((1+q)*n)+1`
  *    (verified: disc(-0.5) over 4 rows is the 3rd, NOT the 2nd).
  *  - a LIST of quantiles returns a LIST of results, same order.
  *  - `median(x)` = quantile_cont for numeric/temporal input,
  *    quantile_disc(0.5) otherwise (DuckDB median('a'..'d') = 'b').
  *  - `histogram(x)` = MAP value→count, keys ascending, NULLs skipped,
  *    NULL (not an empty map) for an empty group.
  *  - `product(x)`: DOUBLE product, NULLs skipped, NULL on empty.
  *  - `generate_series(a, b[, s])` is end-INCLUSIVE, `range(a, b[, s])`
  *    end-EXCLUSIVE; both return BIGINT[] for any integral input (and
  *    empty, never an error, when the step sign cannot reach the stop,
  *    including step 0); single-arg form starts at 0; DATE/TIMESTAMP
  *    bounds with an INTERVAL step return TIMESTAMP[] (dates promote).
  *
  * Scale shape: the quantile/histogram aggregates buffer exact
  * per-distinct-value counts (the same structure as Spark's own
  * `Percentile`), so partial aggregation runs map-side and shuffle
  * volume is O(distinct values per group), not O(rows); the series
  * functions replace themselves with codegen'd `Sequence` expressions
  * at optimization time (zero driver work, constant-folded when the
  * bounds are literals).
  */
object DistributionalExpressions {

  /** Percentage literal(s) from a foldable expression: values and
    * whether the input was a list (list in → list out).
    */
  private[fm] def percentagesOf(e: Expression): (Seq[Double], Boolean) = {
    def toD(v: Any): Double = v match {
      case d: Decimal => d.toDouble
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"quantile fraction must be numeric, got: $other")
    }
    e.eval() match {
      case null => throw new IllegalArgumentException(
        "quantile fraction must not be NULL")
      case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
        val et = e.dataType.asInstanceOf[ArrayType].elementType
        (arr.toObjectArray(et).map(toD).toSeq, true)
      case v => (Seq(toD(v)), false)
    }
  }

  private[fm] def checkPercentages(name: String, e: Expression): Option[String] = {
    if (!e.foldable) return Some(s"$name fraction must be a literal")
    try {
      val (qs, _) = percentagesOf(e)
      if (qs.exists(q => q < -1.0 || q > 1.0))
        // DuckDB 1.0.0's own message shape
        Some(s"$name can only take parameters in the range [-1, 1]")
      else None
    } catch { case ex: IllegalArgumentException => Some(ex.getMessage) }
  }
}

/** Shared exact value→count buffer: the distributional aggregates all
  * reduce to "counts per distinct value, traversed in sorted order".
  * TypedImperativeAggregate plans as ObjectHashAggregate with map-side
  * partial aggregation; buffers serialize as length-prefixed UnsafeRow
  * streams (the codec Spark's Percentile uses).
  */
abstract class CountsAggregate
    extends TypedImperativeAggregate[mutable.HashMap[AnyRef, Long]] {
  def child: Expression

  /** The buffered key's Catalyst type (what update stores). */
  protected def keyType: DataType
  /** Convert one non-null child value to its buffered key. */
  protected def keyOf(v: Any): AnyRef

  override def nullable: Boolean = true

  override def createAggregationBuffer(): mutable.HashMap[AnyRef, Long] =
    mutable.HashMap.empty[AnyRef, Long]

  override def update(
      buf: mutable.HashMap[AnyRef, Long], input: InternalRow): mutable.HashMap[AnyRef, Long] = {
    val v = child.eval(input)
    if (v != null) buf.updateWith(keyOf(v)) { c => Some(c.getOrElse(0L) + 1L) }
    buf
  }

  override def merge(
      buf: mutable.HashMap[AnyRef, Long],
      other: mutable.HashMap[AnyRef, Long]): mutable.HashMap[AnyRef, Long] = {
    other.foreach { case (k, c) => buf.updateWith(k) { p => Some(p.getOrElse(0L) + c) } }
    buf
  }

  override def serialize(obj: mutable.HashMap[AnyRef, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    try {
      val projection = UnsafeProjection.create(Array[DataType](keyType, LongType))
      val buffer = new Array[Byte](4 << 10)
      obj.foreach { case (k, c) =>
        val row = projection(InternalRow(k, c))
        out.writeInt(row.getSizeInBytes)
        row.writeToStream(out, buffer)
      }
      out.writeInt(-1)
      out.flush()
      bos.toByteArray
    } finally {
      out.close()
      bos.close()
    }
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[AnyRef, Long] = {
    val bis = new ByteArrayInputStream(bytes)
    val ins = new DataInputStream(bis)
    try {
      val counts = mutable.HashMap.empty[AnyRef, Long]
      var size = ins.readInt()
      while (size >= 0) {
        val bs = new Array[Byte](size)
        ins.readFully(bs)
        val row = new UnsafeRow(2)
        row.pointTo(bs, size)
        counts.update(row.get(0, keyType).asInstanceOf[AnyRef], row.getLong(1))
        size = ins.readInt()
      }
      counts
    } finally {
      ins.close()
      bis.close()
    }
  }

  /** (sorted distinct keys, their counts, total n) — eval's one pass. */
  protected def sortedCounts(
      buf: mutable.HashMap[AnyRef, Long],
      ord: Ordering[Any]): (Array[AnyRef], Array[Long], Long) = {
    val entries = buf.toArray.sortBy(_._1.asInstanceOf[Any])(ord)
    val keys = entries.map(_._1)
    val counts = entries.map(_._2)
    (keys, counts, counts.sum)
  }
}

/** `quantile_disc(x, q)` / `quantile(x, q)`: exact discrete quantile for
  * any ordering-capable type. See [[DistributionalExpressions]].
  */
case class DuckQuantileDisc(
    child: Expression,
    percentageExpression: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CountsAggregate {

  private lazy val (percentages, returnsList) =
    DistributionalExpressions.percentagesOf(percentageExpression)

  override def prettyName: String = "quantile_disc"
  override def children: Seq[Expression] = Seq(child, percentageExpression)
  override protected def keyType: DataType = child.dataType
  override protected def keyOf(v: Any): AnyRef =
    InternalRow.copyValue(v).asInstanceOf[AnyRef]

  override def dataType: DataType =
    if (returnsList) ArrayType(child.dataType, containsNull = false)
    else child.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    DistributionalExpressions.checkPercentages(prettyName, percentageExpression)
      .map(TypeCheckResult.TypeCheckFailure)
      .getOrElse(TypeUtils.checkForOrderingExpr(child.dataType, prettyName))

  override def eval(buf: mutable.HashMap[AnyRef, Long]): Any = {
    if (buf.isEmpty) return null
    val ord = TypeUtils.getInterpretedOrdering(child.dataType)
    val (keys, counts, n) = sortedCounts(buf, ord)
    def rankOf(q: Double): Long =
      if (q >= 0) math.max(1L, math.ceil(q * n).toLong)
      else math.max(1L, n + 1 - math.ceil(-q * n).toLong)
    def at(rank: Long): AnyRef = {
      var cum = 0L
      var i = 0
      while (i < keys.length) {
        cum += counts(i)
        if (cum >= rank) return keys(i)
        i += 1
      }
      keys(keys.length - 1)
    }
    val picked = percentages.map(q => at(rankOf(q)))
    if (returnsList) new GenericArrayData(picked.toArray) else picked.head
  }

  override def withNewMutableAggBufferOffset(offset: Int): DuckQuantileDisc =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DuckQuantileDisc =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), percentageExpression = newChildren(1))
}

/** `quantile_cont(x, q)`: exact interpolated quantile. Numeric input →
  * DOUBLE; DATE/TIMESTAMP input → TIMESTAMP (values buffered as exact
  * epoch-micros doubles — micros magnitudes sit well inside the 2^53
  * integer-exact range). See [[DistributionalExpressions]].
  */
case class DuckQuantileCont(
    child: Expression,
    percentageExpression: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CountsAggregate {

  private lazy val (percentages, returnsList) =
    DistributionalExpressions.percentagesOf(percentageExpression)

  private lazy val temporal: Boolean = child.dataType match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private lazy val toMicrosOrDouble: Any => Double = child.dataType match {
    case DateType => v => v.asInstanceOf[Int].toDouble * 86400000000.0
    case TimestampType | TimestampNTZType => v => v.asInstanceOf[Long].toDouble
    case ByteType => v => v.asInstanceOf[Byte].toDouble
    case ShortType => v => v.asInstanceOf[Short].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case DoubleType => v => v.asInstanceOf[Double]
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def prettyName: String = "quantile_cont"
  override def children: Seq[Expression] = Seq(child, percentageExpression)
  override protected def keyType: DataType = DoubleType
  override protected def keyOf(v: Any): AnyRef =
    java.lang.Double.valueOf(toMicrosOrDouble(v))

  private def resultType: DataType = child.dataType match {
    case TimestampNTZType => TimestampNTZType
    case DateType | TimestampType => TimestampType
    case _ => DoubleType
  }

  override def dataType: DataType =
    if (returnsList) ArrayType(resultType, containsNull = false) else resultType

  override def checkInputDataTypes(): TypeCheckResult = {
    val err = DistributionalExpressions
      .checkPercentages(prettyName, percentageExpression)
      .orElse(child.dataType match {
        case _: NumericType | DateType | TimestampType | TimestampNTZType => None
        case other => Some(
          s"$prettyName requires numeric or date/timestamp input, got ${other.sql}")
      })
    err.map(TypeCheckResult.TypeCheckFailure)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def eval(buf: mutable.HashMap[AnyRef, Long]): Any = {
    if (buf.isEmpty) return null
    val (keys, counts, n) = sortedCounts(buf, Ordering.Double.TotalOrdering.on[Any](_.asInstanceOf[Double]))
    def valueAt(k: Long): Double = {
      // k is a 0-based index into the EXPANDED sorted multiset.
      var cum = 0L
      var i = 0
      while (i < keys.length) {
        cum += counts(i)
        if (cum > k) return keys(i).asInstanceOf[Double]
        i += 1
      }
      keys(keys.length - 1).asInstanceOf[Double]
    }
    def interp(q0: Double): Any = {
      val q = if (q0 < 0) 1 + q0 else q0
      val pos = q * (n - 1)
      val lo = math.floor(pos).toLong
      val hi = math.ceil(pos).toLong
      val vlo = valueAt(lo)
      val res = if (hi == lo) vlo else vlo + (pos - lo) * (valueAt(hi) - vlo)
      if (temporal) java.lang.Long.valueOf(math.round(res))
      else java.lang.Double.valueOf(res)
    }
    val out = percentages.map(interp)
    if (returnsList) new GenericArrayData(out.toArray) else out.head
  }

  override def withNewMutableAggBufferOffset(offset: Int): DuckQuantileCont =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DuckQuantileCont =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), percentageExpression = newChildren(1))
}

/** `median(x)`: quantile_cont(0.5) for numeric/temporal input (even
  * counts interpolate), quantile_disc(0.5) for anything else (DuckDB's
  * string median is the LOWER middle element).
  */
case class DuckMedian(child: Expression)
    extends AggregateFunction with RuntimeReplaceableAggregate
    with UnaryLike[Expression] {

  override lazy val replacement: Expression = child.dataType match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType =>
      DuckQuantileCont(child, Literal(0.5))
    case _ => DuckQuantileDisc(child, Literal(0.5))
  }

  override def prettyName: String = "median"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `histogram(x)`: MAP of value → count with keys ascending, NULL inputs
  * skipped, NULL result (not `{}`) on an empty group.
  */
case class DuckHistogram(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CountsAggregate {

  override def prettyName: String = "histogram"
  override def children: Seq[Expression] = Seq(child)
  override protected def keyType: DataType = child.dataType
  override protected def keyOf(v: Any): AnyRef =
    InternalRow.copyValue(v).asInstanceOf[AnyRef]

  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def eval(buf: mutable.HashMap[AnyRef, Long]): Any = {
    if (buf.isEmpty) return null
    val ord = TypeUtils.getInterpretedOrdering(child.dataType)
    val (keys, counts, _) = sortedCounts(buf, ord)
    new ArrayBasedMapData(
      new GenericArrayData(keys.asInstanceOf[Array[Any]]),
      new GenericArrayData(counts))
  }

  override def withNewMutableAggBufferOffset(offset: Int): DuckHistogram =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DuckHistogram =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `entropy(x)`: Shannon entropy in BITS of the value distribution —
  * H = log2(n) − (Σ c·log2 c)/n over the exact value→count table, any
  * ordering-capable type. DuckDB pins: NULLs skipped, and an EMPTY (or
  * all-NULL) group yields 0.0, not NULL. The count terms sum in sorted
  * key order so the double accumulation is partition-order-independent;
  * DuckDB's own accumulation order may still differ in the last ulp, so
  * differential rows round(…, 9).
  */
case class DuckEntropy(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CountsAggregate {

  override def prettyName: String = "entropy"
  override def children: Seq[Expression] = Seq(child)
  override protected def keyType: DataType = child.dataType
  override protected def keyOf(v: Any): AnyRef =
    InternalRow.copyValue(v).asInstanceOf[AnyRef]

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def eval(buf: mutable.HashMap[AnyRef, Long]): Any = {
    if (buf.isEmpty) return 0.0
    val ord = TypeUtils.getInterpretedOrdering(child.dataType)
    val (_, counts, n) = sortedCounts(buf, ord)
    var acc = 0.0
    var i = 0
    while (i < counts.length) {
      val c = counts(i).toDouble
      acc += c * (math.log(c) / math.log(2.0))
      i += 1
    }
    math.log(n.toDouble) / math.log(2.0) - acc / n
  }

  override def withNewMutableAggBufferOffset(offset: Int): DuckEntropy =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DuckEntropy =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `mad(x)`: median absolute deviation — the interpolated median of
  * |x − median(x)|, numeric input, DOUBLE out (DuckDB returns DECIMAL
  * for DECIMAL input — documented divergence; the VALUES agree). Both
  * medians interpolate on even counts (mad of [1,2,4,10] = 1.5).
  * Exact from the same counts-map pass: the deviation table folds out
  * of the value table around the computed median.
  */
case class DuckMad(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CountsAggregate {

  override def prettyName: String = "mad"
  override def children: Seq[Expression] = Seq(child)
  override protected def keyType: DataType = child.dataType
  override protected def keyOf(v: Any): AnyRef =
    InternalRow.copyValue(v).asInstanceOf[AnyRef]

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mad requires a numeric input, got ${other.simpleString(32)}")
  }

  private lazy val toDouble: Any => Double = child.dataType match {
    case ByteType => v => v.asInstanceOf[Byte].toDouble
    case ShortType => v => v.asInstanceOf[Short].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case DoubleType => v => v.asInstanceOf[Double]
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
  }

  /** Interpolated median of a sorted weighted value table. */
  private def weightedMedian(vals: Array[Double], counts: Array[Long], n: Long): Double = {
    // cont semantics at q = 0.5: position p = 0.5 * (n - 1) (0-based),
    // interpolate between the values at ranks floor(p) and ceil(p)
    val p = 0.5 * (n - 1).toDouble
    val lo = math.floor(p).toLong
    val hi = math.ceil(p).toLong
    def at(rank0: Long): Double = {
      var cum = 0L
      var i = 0
      while (i < vals.length) {
        cum += counts(i)
        if (cum >= rank0 + 1) return vals(i)
        i += 1
      }
      vals(vals.length - 1)
    }
    val a = at(lo)
    val b = at(hi)
    if (lo == hi) a else a + (b - a) * (p - lo)
  }

  override def eval(buf: mutable.HashMap[AnyRef, Long]): Any = {
    if (buf.isEmpty) return null
    val entries = buf.toArray
      .map { case (k, c) => (toDouble(k), c) }
      .sortBy(_._1)
    val vals = entries.map(_._1)
    val counts = entries.map(_._2)
    val n = counts.sum
    val med = weightedMedian(vals, counts, n)
    // deviation table: |v - med| with counts, re-sorted and re-merged
    // (two values can share a deviation)
    val dev = mutable.TreeMap.empty[Double, Long]
    var i = 0
    while (i < vals.length) {
      val d = math.abs(vals(i) - med)
      dev.update(d, dev.getOrElse(d, 0L) + counts(i))
      i += 1
    }
    weightedMedian(dev.keysIterator.toArray, dev.valuesIterator.toArray, n)
  }

  override def withNewMutableAggBufferOffset(offset: Int): DuckMad =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DuckMad =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `product(x)`: DOUBLE running product, NULLs skipped, NULL on empty —
  * a two-expression declarative aggregate (codegen'd, map-side partial).
  * Floating multiplication is order-sensitive; callers wanting exact
  * cross-engine hashes keep factors integer-exact in a double (the
  * pinned oracle row multiplies powers of two).
  */
case class DuckProduct(child: Expression)
    extends DeclarativeAggregate with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  override def prettyName: String = "product"
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val prod = AttributeReference("product", DoubleType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(prod)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), prod,
      Multiply(Coalesce(Seq(prod, Literal(1.0))), child)))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(prod.right), prod.left,
      Multiply(Coalesce(Seq(prod.left, Literal(1.0))), prod.right)))
  override lazy val evaluateExpression: Expression = prod

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `generate_series` (end-inclusive) / `range` (end-exclusive) as a
  * scalar list function. Replaces itself with a guarded codegen'd
  * `Sequence` at optimization: integral inputs widen to BIGINT (DuckDB
  * returns BIGINT[] for every integral width); DATE/TIMESTAMP bounds
  * with an INTERVAL step promote to TIMESTAMP[]; a step that cannot
  * reach the stop (wrong sign or zero) yields an EMPTY list where raw
  * `sequence()` would error. The end-exclusive form shifts the stop one
  * step-sign unit (integers) or one microsecond (timestamps) toward the
  * start.
  */
case class DuckSeries(args: Seq[Expression], exclusive: Boolean)
    extends Expression with RuntimeReplaceable {

  override def children: Seq[Expression] = args
  override def prettyName: String = if (exclusive) "range" else "generate_series"

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def temporal(t: DataType): Boolean = t match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (args.isEmpty || args.length > 3)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes 1 to 3 arguments, got ${args.length}")
    val stop = if (args.length == 1) args(0) else args(1)
    if (integral(stop.dataType)) {
      if (args.forall(a => integral(a.dataType))) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName over integers requires integral bounds and step")
    } else if (temporal(stop.dataType)) {
      if (args.length != 3) TypeCheckResult.TypeCheckFailure(
        s"$prettyName over dates/timestamps requires an explicit INTERVAL step")
      else if (!temporal(args(0).dataType)) TypeCheckResult.TypeCheckFailure(
        s"$prettyName bounds must both be dates/timestamps")
      else args(2).dataType match {
        case _: DayTimeIntervalType | _: YearMonthIntervalType | CalendarIntervalType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName step over dates/timestamps must be an INTERVAL, got ${other.sql}")
      }
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires integral or date/timestamp bounds, got ${stop.dataType.sql}")
  }

  // The replacement is built AFTER analysis (ReplaceExpressions), so
  // time-zone-aware nodes inside it (Sequence, temporal Casts) must be
  // constructed with the session zone already set — the analyzer's
  // ResolveTimeZone pass has already run.
  private def tz: Option[String] =
    Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)

  override lazy val replacement: Expression = {
    val (a, b, s) = args match {
      case Seq(b0) => (Literal(0L), b0, Literal(1L))
      case Seq(a0, b0) => (a0, b0, Literal(1L))
      case Seq(a0, b0, s0) => (a0, b0, s0)
    }
    if (integral(b.dataType)) intSeries(a, b, s) else timeSeries(a, b, s)
  }

  private def intSeries(a: Expression, b: Expression, s: Expression): Expression = {
    val al = Cast(a, LongType)
    val bl = Cast(b, LongType)
    val sl = Cast(s, LongType)
    val zero = Literal(0L)
    val sgn = CaseWhen(Seq(
      (GreaterThan(sl, zero), Literal(1L)),
      (LessThan(sl, zero), Literal(-1L))), zero)
    val stop = if (exclusive) Subtract(bl, sgn) else bl
    val empty = Or(
      EqualTo(sl, zero),
      Or(And(GreaterThan(sl, zero), GreaterThan(al, stop)),
        And(LessThan(sl, zero), LessThan(al, stop))))
    If(empty,
      Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)),
      Sequence(al, stop, Some(sl), tz))
  }

  private def timeSeries(a: Expression, b: Expression, s: Expression): Expression = {
    val at = Cast(a, TimestampType, tz)
    val bt = Cast(b, TimestampType, tz)
    // The emptiness guard needs the step's sign; a literal interval (the
    // only spelling DuckDB queries use — its table function rejects
    // column steps outright) makes it static. A non-literal step falls
    // through to the raw Sequence, whose own error is loud.
    val sign: Option[Int] = s match {
      case Literal(v: Long, _: DayTimeIntervalType) => Some(java.lang.Long.signum(v))
      case Literal(v: Int, _: YearMonthIntervalType) => Some(Integer.signum(v))
      case Literal(ci: CalendarInterval, CalendarIntervalType) =>
        val sgns = Seq(ci.months.toLong, ci.days.toLong, ci.microseconds)
          .filter(_ != 0L).map(java.lang.Long.signum).distinct
        if (sgns.isEmpty) Some(0) else if (sgns.length == 1) Some(sgns.head) else None
      case _ => None
    }
    val emptyLit = Literal.create(
      Array.empty[Long], ArrayType(TimestampType, containsNull = false))
    sign match {
      case Some(0) => emptyLit
      case Some(sg) =>
        val stop =
          if (exclusive)
            MicrosToTimestamp(Subtract(UnixMicros(bt), Literal(sg.toLong)))
          else bt
        val empty =
          if (sg > 0) GreaterThan(UnixMicros(at), UnixMicros(stop))
          else LessThan(UnixMicros(at), UnixMicros(stop))
        If(empty, emptyLit, Sequence(at, stop, Some(s), tz))
      case None =>
        val stop =
          if (exclusive)
            MicrosToTimestamp(Subtract(UnixMicros(bt), Literal(1L)))
          else bt
        Sequence(at, stop, Some(s), tz)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(args = newChildren)
}

/** DuckDB `len(x)`: element count for a LIST, character length for
  * everything else (the files table's arrays are JSON-encoded strings —
  * ADR-0006 — so the original string-only alias was enough until the
  * series functions put real LISTs in scope). Branches on the resolved
  * child type, like [[DuckMedian]].
  */
case class DuckLen(child: Expression)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {

  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType => Size(child, legacySizeOfNull = false)
    case _ => Length(child)
  }

  override def prettyName: String = "len"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
