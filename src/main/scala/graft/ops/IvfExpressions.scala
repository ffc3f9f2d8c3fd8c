package graft.ops

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Shared kernel for IVF nearest-cell assignment: sequential
  * double-precision cosine against each centroid, argmax with cid
  * tie-break (centroids arrive sorted by cid, and strict `>` keeps the
  * earliest on ties — the same total order as
  * [[graft.queries.Similarity.cosine]] + minBy((-sim, cid))). One
  * definition for interpreted eval and generated code, so the DuckDB
  * oracle's ROW_NUMBER replay stays bit-identical.
  */
object IvfOps {
  private def cosine(a: ArrayData, b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.numElements(), b.length)
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Ids of the `k` nearest centroids by (cosine desc, cid asc). */
  def nearestCells(
      v: ArrayData,
      cents: Array[Array[Float]],
      cids: Array[Long],
      k: Int): ArrayData = {
    val n = cents.length
    val sims = new Array[Double](n)
    var i = 0
    while (i < n) { sims(i) = cosine(v, cents(i)); i += 1 }
    val chosen = new Array[Long](k)
    val used = new Array[Boolean](n)
    var j = 0
    while (j < k) {
      var best = -1
      var c = 0
      while (c < n) {
        if (!used(c) && (best == -1 || sims(c) > sims(best))) best = c
        c += 1
      }
      used(best) = true
      chosen(j) = cids(best)
      j += 1
    }
    new GenericArrayData(chosen)
  }
}

/** `graft_ivf_cells(embedding, k)` — the k nearest coarse-quantizer
  * cells as a native Catalyst expression. The centroid matrix is a
  * plan-time constant carried as a codegen reference object, so both
  * assignment (k=1) and query probing (k=nprobe) stay inside
  * whole-stage codegen — no per-row UDF on the IVF hot path, the same
  * promotion [[LshSignature]] got for the LSH path.
  */
case class IvfNearestCells(
    child: Expression,
    cents: Array[Array[Float]],
    cids: Array[Long],
    k: Int) extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ivf_cells"

  override def nullSafeEval(v: Any): Any =
    IvfOps.nearestCells(v.asInstanceOf[ArrayData], cents, cids, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "float[][]")
    val cidsRef = ctx.addReferenceObj("ivfCids", cids, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.ops.IvfOps.nearestCells($a, $centsRef, $cidsRef, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session registration: `graft_ivf_cells(embedding, k)` with the
  * centroids bound at registration time; `k` must be an integer
  * literal (it sizes the result at plan time).
  */
object IvfFunctions {
  def register(
      spark: org.apache.spark.sql.SparkSession,
      centroids: Array[(Long, Array[Float])]): Unit = {
    val cids = centroids.map(_._1)
    val cents = centroids.map(_._2)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ivf_cells",
      e => {
        val k = e(1) match {
          case Literal(i: Int, IntegerType) => i
          case other =>
            throw new IllegalArgumentException(
              s"graft_ivf_cells: k must be an integer literal, got $other")
        }
        // Range-check at plan time: k beyond the centroid count would
        // index used(-1) at runtime (ADVICE r5). Fail the query here,
        // where the message still names the function and the bound.
        if (k < 1 || k > cents.length)
          throw new IllegalArgumentException(
            s"graft_ivf_cells: k must be in [1, ${cents.length}], got $k")
        IvfNearestCells(e.head, cents, cids, k)
      },
      "built-in")
  }
}
