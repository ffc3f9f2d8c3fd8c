package graft.ops

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Random-projection kernel (Johnson–Lindenstrauss dimensionality
  * reduction): out[j] = float32(Σ_i v[i] * plane_j[i]), the sequential
  * double-precision dot the other embedding kernels use, so the DuckDB
  * oracle replays it with `list_aggregate(…, 'sum')` + CAST AS REAL
  * bit-for-bit. One definition for interpreted eval and generated code.
  */
object ProjOps {
  def project(v: ArrayData, planes: Array[Array[Double]]): ArrayData = {
    val out = new Array[Float](planes.length)
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var s = 0.0
      var i = 0
      val n = math.min(v.numElements(), p.length)
      while (i < n) { s += v.getFloat(i).toDouble * p(i); i += 1 }
      out(j) = s.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_project(embedding)` — the projected vector as a native
  * codegen expression; the (outDim x dim) plane matrix is a plan-time
  * constant carried as a codegen reference object (same promotion as
  * [[LshSignature]] / [[IvfNearestCells]]).
  */
case class RandomProjection(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_project"

  override def nullSafeEval(v: Any): Any =
    ProjOps.project(v.asInstanceOf[ArrayData], planes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("projPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.ops.ProjOps.project($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ProjFunctions {
  def register(spark: org.apache.spark.sql.SparkSession,
               planes: Array[Array[Double]]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_project", e => RandomProjection(e.head, planes), "built-in")
}
