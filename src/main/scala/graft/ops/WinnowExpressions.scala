package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing fingerprint kernel (Schleimer et al., MOSS):
  * hash every k-byte gram of the document with the portable 60-bit
  * md5 prefix, keep the minimum of each w-wide window of consecutive
  * gram hashes (monotonic-deque sliding min, O(n) total), and reduce
  * the distinct minima to (count, xor). The whole computation is
  * LOCAL to a document — no explode, no per-doc window shuffle, no
  * distinct exchange — which is the shape that matters at 100 TB:
  * fingerprinting becomes an embarrassingly parallel scan. The
  * window/explode SQL formulation survives as the DuckDB oracle
  * replay ([[graft.queries.TextQueries]] q_text_winnow) and as the
  * CurationSpec cross-check; both pin these exact values.
  *
  * Positions are BYTE offsets (the kernel hashes UTF-8 bytes). For
  * ASCII corpora — the oracle gate's — byte and character grams are
  * identical; on multi-byte text the kernel remains a valid
  * fingerprint scheme, just over byte grams.
  */
object WinnowOps {
  // MessageDigest is not thread-safe; executor tasks share a JVM.
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(bytes[off, off+k)) == parsing the first 15 hex
    * chars of the digest, the same value as the SQL
    * `conv(substr(md5(x), 1, 15), 16, 10)`.
    */
  private def gramHash(d: MessageDigest, bytes: Array[Byte], off: Int, k: Int): Long = {
    d.reset()
    d.update(bytes, off, k)
    val dig = d.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    h >>> 4 // 64 bits accumulated, drop the low nibble -> first 15 hex chars
  }

  /** The winnow core: hash every k-gram, slide a w-wide monotonic-deque
    * minimum over the gram hashes, and invoke `onMin` once per window
    * minimum (duplicates included — accumulators dedup as they see fit).
    * ONE copy of the index arithmetic serves both the summary expression
    * and the set expression; the callback is a monomorphic
    * megamorphic-free lambda the JIT inlines. Returns false when the
    * document is shorter than one full window (k + w - 1 bytes).
    */
  private def forEachWindowMin(
      s: UTF8String, k: Int, w: Int)(onMin: Long => Unit): Boolean = {
    val bytes = s.getBytes
    val ng = bytes.length - k + 1
    if (ng < w) return false
    val d = md5.get()
    val hs = new Array[Long](ng)
    var i = 0
    while (i < ng) { hs(i) = gramHash(d, bytes, i, k); i += 1 }
    // sliding min over windows [i, i+w): monotonic deque of indices
    val deque = new Array[Int](ng)
    var (head, tail) = (0, 0) // deque content lives in [head, tail)
    i = 0
    while (i < ng) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) onMin(hs(deque(head)))
      i += 1
    }
    true
  }

  /** Distinct window minima, sorted ascending, with zero per-minimum
    * boxing: consecutive windows usually share the same minimum (that is
    * the point of winnowing), so appending only on CHANGE bounds the
    * buffer near the true fingerprint count (~n/w) rather than the
    * window count; one primitive sort + in-place dedup finishes the set.
    */
  private def collectMinima(s: UTF8String, k: Int, w: Int): Array[Long] = {
    var buf = new Array[Long](16)
    var n = 0
    forEachWindowMin(s, k, w) { m =>
      if (n == 0 || buf(n - 1) != m) {
        if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n << 1)
        buf(n) = m; n += 1
      }
    }
    if (n == 0) return Array.emptyLongArray
    java.util.Arrays.sort(buf, 0, n)
    var out = 1
    var i = 1
    while (i < n) {
      if (buf(i) != buf(out - 1)) { buf(out) = buf(i); out += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(buf, out)
  }

  /** (n_fp, fp_xor) over the distinct window minima; (0, 0) when the
    * document is shorter than one full window (k + w - 1 bytes).
    */
  def fingerprints(s: UTF8String, k: Int, w: Int): InternalRow = {
    val fps = collectMinima(s, k, w)
    var xor = 0L
    var i = 0
    while (i < fps.length) { xor ^= fps(i); i += 1 }
    InternalRow(fps.length.toLong, xor)
  }

  /** The distinct window minima themselves, sorted ascending — the
    * document's full fingerprint set, for operators that need to JOIN
    * on fingerprints (cross-document duplicate-span detection) rather
    * than summarize them. Set size is bounded by ~n/w fingerprints per
    * document (each window contributes one), so the explode this feeds
    * is narrow.
    */
  def fingerprintSet(s: UTF8String, k: Int, w: Int): ArrayData =
    new GenericArrayData(collectMinima(s, k, w))
}

/** `graft_winnow(text)` — winnowing fingerprint summary as a native
  * codegen expression returning `struct(n_fp BIGINT, fp_xor BIGINT)`.
  * k and w are plan-time constants bound at registration.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_fp", LongType, nullable = false),
    StructField("fp_xor", LongType, nullable = false)))
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(v: Any): Any =
    WinnowOps.fingerprints(v.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.ops.WinnowOps.fingerprints($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_winnow_set(text)` — the document's distinct fingerprint set
  * as `ARRAY<BIGINT>` (sorted ascending), for fingerprint-join
  * operators. Same kernel, same plan-time k/w binding.
  */
case class WinnowFingerprintSet(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_set"

  override def nullSafeEval(v: Any): Any =
    WinnowOps.fingerprintSet(v.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.ops.WinnowOps.fingerprintSet($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFunctions {
  def register(spark: org.apache.spark.sql.SparkSession, k: Int, w: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow", e => WinnowFingerprint(e.head, k, w), "built-in")

  /** Registered under its own name so a query can bind DIFFERENT k/w
    * than the summary function in the same session (cross-dup uses
    * longer grams than per-doc fingerprinting).
    */
  def registerSet(spark: org.apache.spark.sql.SparkSession, k: Int, w: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_set", e => WinnowFingerprintSet(e.head, k, w), "built-in")
}
