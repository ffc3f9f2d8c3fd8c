package graft.semantic

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Double-precision kernels shared by interpreted eval and generated code.
  * Element order is sequential, so results are deterministic; the oracle
  * computes the same element-wise double expression (DuckDB's own
  * `list_cosine_similarity` accumulates in float32 with a different order,
  * so comparisons cast the final value to float32).
  */
object CosineOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  def similarity(a: ArrayData, b: ArrayData): Double = dot(a, b) / (norm(a) * norm(b))
  def distance(a: ArrayData, b: ArrayData): Double = 1.0 - similarity(a, b)
}

/** `array_cosine_similarity(a, b)` (reference exposes DuckDB VSS's
  * function to user SQL — `server.py:139-145`, README.md:318-333) as a
  * native Catalyst expression: codegen emits a static call that stays
  * inside whole-stage codegen, no UDF serialization on the hot path.
  */
abstract class CosineBase extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  protected def method: String

  override def nullSafeEval(a: Any, b: Any): Any =
    if (method == "similarity")
      CosineOps.similarity(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else CosineOps.distance(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.semantic.CosineOps.$method($a, $b);")
}

case class ArrayCosineSimilarity(left: Expression, right: Expression) extends CosineBase {
  override protected def method: String = "similarity"
  override def prettyName: String = "array_cosine_similarity"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class ArrayCosineDistance(left: Expression, right: Expression) extends CosineBase {
  override protected def method: String = "distance"
  override def prettyName: String = "array_cosine_distance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Session registration for the cosine functions under both the VSS names
  * and DuckDB's list_* aliases (reference loads VSS at
  * `semantic/query.py:24-25`; here the expressions are native, B22-B23).
  */
object CosineFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "array_cosine_similarity", e => ArrayCosineSimilarity(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "array_cosine_distance", e => ArrayCosineDistance(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "list_cosine_similarity", e => ArrayCosineSimilarity(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "list_cosine_distance", e => ArrayCosineDistance(e(0), e(1)), "built-in")
  }
}
