package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass codegen kernel for the 64-point perceptual text signature.
  *
  * Bit-for-bit identical to the SQL formulation the DuckDB oracle
  * replays (PipelineQueries.phashOracleCte), parameterized by the
  * sample count P (= PhPix, 60 — 4 bands × 15 bits):
  *   px(j) = codepoint of the character at 1-based position
  *           (j * nc) DIV P + 1   (nc = codepoint length),
  *   bit j set iff px(j) * P > Σ px  (j = 0..P-1).
  *
  * The r13 scale probe measured the former higher-order-function
  * pipeline (transform + two aggregates — HOFs are CodegenFallback, so
  * 64 interpreted O(n) substr probes per document) at ~50 s of the
  * 100×-scale runtime; this kernel decodes each document's codepoints
  * ONCE and runs inside whole-stage codegen.
  */
object PhashOps {
  def phash(text: UTF8String, p: Int): Long = {
    val cps = text.toString.codePoints.toArray
    val n = cps.length.toLong
    if (n == 0) return 0L // callers filter empty text; parity guard only
    val px = new Array[Long](p)
    var ps = 0L
    var j = 0
    while (j < p) {
      px(j) = cps(((j * n) / p).toInt).toLong
      ps += px(j)
      j += 1
    }
    var h = 0L
    j = 0
    while (j < p) {
      if (px(j) * p > ps) h |= (1L << j)
      j += 1
    }
    h
  }
}

case class PhashSig(child: Expression, p: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(p >= 1 && p <= 64, s"graft_phash: sample count $p out of [1, 64]")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash"
  override protected def nullSafeEval(v: Any): Any =
    PhashOps.phash(v.asInstanceOf[UTF8String], p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.PhashOps.phash($c, $p)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PhashFunctions {
  /** Registers `graft_phash(text, p)`; p must be a foldable int. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_phash", { e =>
        val p = e(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_phash: sample count must be a literal, got $other")
        }
        PhashSig(e.head, p)
      }, "built-in")
}
