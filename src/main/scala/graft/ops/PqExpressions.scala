package graft.ops

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Product-quantization code assignment: for each of M contiguous
  * subspaces of the vector, the id of the nearest sub-centroid by
  * sequential double-precision squared L2 (ascending dim order, strict
  * `<` keeps the LOWEST code on ties — the same total order as the
  * DuckDB oracle's `ROW_NUMBER ... ORDER BY d2, code` replay). One
  * definition serves interpreted eval and generated code.
  */
object PqOps {

  /** `cb(m)(code)` is the sub-centroid matrix; every row must have the
    * same sub-dimension. Returns the M assigned codes.
    */
  def codes(v: ArrayData, cb: Array[Array[Array[Float]]]): ArrayData = {
    val m = cb.length
    val out = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val cents = cb(s)
      val sub = cents(0).length
      var best = -1
      var bestD = 0.0
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x = v.getFloat(off + i).toDouble - cent(i)
          d += x * x
          i += 1
        }
        if (best == -1 || d < bestD) { best = c; bestD = d }
        c += 1
      }
      out(s) = best
      off += sub
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_pq_codes(embedding)` — the M-byte PQ code word as a native
  * Catalyst expression (`ARRAY<INT>`, one code per subspace). The
  * codebook is a plan-time constant carried as a codegen reference
  * object, so assignment stays inside whole-stage codegen — the same
  * promotion the LSH/IVF kernels got; no per-row UDF on the hot path.
  */
case class PqCodes(child: Expression, cb: Array[Array[Array[Float]]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  override def nullSafeEval(v: Any): Any =
    PqOps.codes(v.asInstanceOf[ArrayData], cb)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.ops.PqOps.codes($a, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqFunctions {
  def register(
      spark: org.apache.spark.sql.SparkSession,
      codebook: Array[Array[Array[Float]]]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_codes", e => PqCodes(e.head, codebook), "built-in")
}
