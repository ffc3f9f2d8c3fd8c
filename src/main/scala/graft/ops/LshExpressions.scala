package graft.ops

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Shared kernel for the random-hyperplane signature: sequential
  * float→double dot products against each plane, sign bit j = plane j.
  * One definition used by interpreted eval, generated code, and the
  * driver-side helper ([[graft.queries.Similarity.signature]] delegates
  * here), so the DuckDB oracle's element-wise replay stays bit-identical
  * everywhere.
  */
object LshOps {
  // LONG signature: the adaptive band width (r13 scale probe — a fixed
  // 4-bit band space made batch-vs-corpus candidate joins quadratic at
  // 100x) takes up to 4 bands x 12 bits = 48 planes
  def signature(v: ArrayData, planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var j = 0
    val nv = v.numElements()
    while (j < planes.length) {
      val p = planes(j)
      var s = 0.0
      var i = 0
      val n = math.min(nv, p.length)
      while (i < n) { s += v.getFloat(i) * p(i); i += 1 }
      if (s >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** `graft_lsh_sig(embedding)` — the banded-LSH signature as a native
  * Catalyst expression. The plane matrix is a plan-time constant carried
  * as a codegen reference object, so signature computation stays inside
  * whole-stage codegen (no UDF serialization, no opaque BatchEval node on
  * the ANN hot path — VERDICT r4 item 2).
  */
case class LshSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_sig"

  override def nullSafeEval(v: Any): Any =
    LshOps.signature(v.asInstanceOf[ArrayData], planes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.ops.LshOps.signature($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session registration: `graft_lsh_sig(embedding)` with the plane matrix
  * bound at registration time (the planes are seeded plan constants, not
  * data, so they ride along as a codegen reference object).
  */
object LshFunctions {
  def register(spark: org.apache.spark.sql.SparkSession,
               planes: Array[Array[Double]]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_sig", e => LshSignature(e.head, planes), "built-in")
}
