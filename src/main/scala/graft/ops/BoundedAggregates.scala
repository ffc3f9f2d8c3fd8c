package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** Declarative bounded aggregates (VERDICT r2 item 5).
  *
  * The previous typed `Aggregator` implementations were partial-aggregate
  * friendly but planned as `ObjectHashAggregate` behind
  * `AppendColumns`/`DeserializeToObject` — every row serialized to a JVM
  * object, zero whole-stage-codegen spans. These versions express
  * update/merge as Catalyst EXPRESSIONS over an array-typed buffer, so
  * the planner runs them as a codegen'd aggregate with map-side partial
  * aggregation, and the call sites stay pure `DataFrame` column code (no
  * Dataset object round-trip).
  *
  * Scale behavior is unchanged and is the point of both operators: the
  * buffer never exceeds k elements, so per-group state — and therefore
  * shuffle volume after partial aggregation — is O(k), independent of
  * group size. A `Window.partitionBy(lowCardKey) + row_number` plan would
  * instead funnel whole partitions into one task per key at 100 TB.
  */
abstract class BoundedArrayAggregate extends DeclarativeAggregate {
  def child: Expression
  def kExpr: Expression

  protected lazy val k: Int = kExpr.eval() match {
    case n: java.lang.Number => n.intValue() // any integral width admitted by the type check
    case other => throw new IllegalArgumentException(s"k must be integral, got $other")
  }

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)

  protected def bufferType: ArrayType = ArrayType(child.dataType, containsNull = false)
  protected lazy val buf: AttributeReference =
    AttributeReference(prettyName + "_buf", bufferType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(buf)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(Seq.empty[Any], bufferType))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a literal")
    } else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType)) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be integral")
    } else if (k < minK) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be >= $minK, got $k")
    } else {
      TypeUtils.checkForOrderingExpr(child.dataType, prettyName)
    }
  }
  protected def minK: Int = 1

  /** `slice(sort_array(arr), 1, k)` — the bounded sorted insert/merge. */
  protected def sortedHead(arr: Expression): Expression =
    Slice(SortArray(arr, Literal(true)), Literal(1), Literal(k))

  /** True when the buffer is full and `child` can't displace its last
    * (largest) element — skips the per-row sort on the hot path. Safe
    * under ANSI: `element_at(buf, -1)` only evaluates when size >= k >= 1
    * (`And` short-circuits).
    */
  protected lazy val cannotDisplace: Expression =
    And(GreaterThanOrEqual(Size(buf), Literal(k)),
      GreaterThanOrEqual(child, ElementAt(buf, Literal(-1))))
}

/** `graft_top_k(item, k)`: the k smallest `item`s per group in ascending
  * natural order. `item` is typically a struct whose leading fields encode
  * the sort (negate a numeric field for DESC); structs compare
  * field-by-field, so trailing fields can carry payload.
  */
case class BoundedTopK(child: Expression, kExpr: Expression) extends BoundedArrayAggregate {
  override def prettyName: String = "graft_top_k"
  override def dataType: DataType = bufferType

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), buf,
      If(cannotDisplace, buf,
        sortedHead(Concat(Seq(buf, CreateArray(Seq(child))))))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    sortedHead(Concat(Seq(buf.left, buf.right))))

  override lazy val evaluateExpression: Expression = buf

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** `graft_kmv(hash60, k)`: KMV (k-minimum-values) distinct-count estimate
  * over portable 60-bit hashes — `(k-1) / r_k` with `r_k` the kth smallest
  * distinct hash normalized to [0,1); exact count below k distinct. Fully
  * deterministic (unlike HLL), so a SQL oracle recomputes the same
  * kth-order statistic.
  */
case class KmvSketch(child: Expression, kExpr: Expression) extends BoundedArrayAggregate {
  override def prettyName: String = "graft_kmv"
  override def dataType: DataType = DoubleType
  override protected def minK: Int = 2
  override protected def bufferType: ArrayType = ArrayType(LongType, containsNull = false)

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), buf,
      If(cannotDisplace, buf,
        If(ArrayContains(buf, child), buf,
          sortedHead(Concat(Seq(buf, CreateArray(Seq(child)))))))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    sortedHead(ArrayDistinct(Concat(Seq(buf.left, buf.right)))))

  // size < k: the buffer IS the exact distinct set. Otherwise the
  // classic KMV estimator off the kth order statistic. The kth smallest
  // hash is 0 only when k = 1, excluded by minK = 2.
  override lazy val evaluateExpression: Expression =
    If(LessThan(Size(buf), Literal(k)),
      Cast(Size(buf), DoubleType),
      Divide(Literal((k - 1).toDouble * KmvSketch.HashSpace),
        Cast(ElementAt(buf, Literal(-1)), DoubleType)))

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object KmvSketch {
  /** Hashes are 60-bit (md5-derived), so the normalized space is 2^60. */
  val HashSpace: Double = math.pow(2.0, 60)
}

/** Session registration; the analyzer wraps a bare `AggregateFunction`
  * into an `AggregateExpression` during function resolution.
  */
object GraftAggregates {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_top_k", e => BoundedTopK(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_kmv", e => KmvSketch(e(0), e(1)), "built-in")
  }
}
