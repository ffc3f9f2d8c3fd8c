package graft.fm

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's string-similarity function family, available to passthrough
  * SQL via the reference's verbatim `query` surface (`query.py:72`).
  * Spark ships only `levenshtein`; the rest are implemented here as
  * codegen'd binary expressions over a static kernel object.
  *
  * Semantics pinned against DuckDB 1.0.0 (StringDistanceSpec + the
  * `strdist` fuzz family):
  *  - `jaccard(a, b)`: similarity of the CHARACTER SETS (codepoints),
  *    |A∩B| / |A∪B|; an empty argument is an error ("argument too
  *    short"), identical sets are 1.0;
  *  - `jaro_similarity` / `jaro_winkler_similarity`: standard Jaro and
  *    Jaro-Winkler (prefix scale 0.1, prefix cap 4, boost threshold
  *    0.7 — verified: a 0.6 Jaro with a 4-char common prefix gets NO
  *    boost); ANY empty argument yields 0.0 (DuckDB: jaro('','') = 0);
  *  - `damerau_levenshtein`: the TRUE (unrestricted) Damerau-
  *    Levenshtein distance with full transposition tracking — verified
  *    'ca'→'abc' = 2 where the restricted OSA variant says 3;
  *  - `hamming(a, b)` (alias `mismatches`): positions that differ;
  *    unequal lengths are an error, DuckDB's message shape;
  *  - `editdist3` is DuckDB's alias for plain levenshtein (Spark's
  *    builtin, registered as an alias in [[Dialect.register]]).
  *
  * All operate on codepoints (UTF8String.toString → Java chars is fine
  * for the BMP corpus surface; DuckDB compares bytes for ASCII and
  * codepoints beyond — identical on the data these queries see).
  * NULL in → NULL out (BinaryExpression nullSafeEval).
  */
object StrDistOps {

  def jaccard(l: UTF8String, r: UTF8String): Double = {
    val a = l.toString
    val b = r.toString
    if (a.isEmpty || b.isEmpty)
      throw new IllegalArgumentException(
        "Jaccard Function: An argument too short!")
    val sa = new java.util.HashSet[Integer]()
    val sb = new java.util.HashSet[Integer]()
    a.codePoints().forEach(c => { sa.add(c); () })
    b.codePoints().forEach(c => { sb.add(c); () })
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    inter.toDouble / (sa.size + sb.size - inter).toDouble
  }

  def jaro(l: UTF8String, r: UTF8String): Double = {
    val a = l.toString
    val b = r.toString
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val window = math.max(a.length, b.length) / 2 - 1
    val aMatched = new Array[Boolean](a.length)
    val bMatched = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - transpositions / 2.0) / m) / 3.0
  }

  def jaroWinkler(l: UTF8String, r: UTF8String): Double = {
    val j = jaro(l, r)
    if (j <= 0.7) return j // boost threshold, DuckDB-verified
    val a = l.toString
    val b = r.toString
    var prefix = 0
    while (prefix < math.min(4, math.min(a.length, b.length)) &&
      a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  /** True Damerau-Levenshtein (unrestricted transpositions): the
    * alphabet-indexed DP, O(|a|·|b|) time, O(|a|·|b|) space.
    */
  def damerauLevenshtein(l: UTF8String, r: UTF8String): Long = {
    val a = l.toString
    val b = r.toString
    val n = a.length
    val m = b.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = n + m
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    for (i <- 0 to n) { d(i + 1)(1) = i; d(i + 1)(0) = inf }
    for (j <- 0 to m) { d(1)(j + 1) = j; d(0)(j + 1) = inf }
    val lastRow = new java.util.HashMap[Character, Integer]()
    for (i <- 1 to n) {
      var lastMatchCol = 0
      for (j <- 1 to m) {
        val i1: Int = Option(lastRow.get(b.charAt(j - 1))).map(_.intValue).getOrElse(0)
        val j1 = lastMatchCol
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { lastMatchCol = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, // substitute / match
            math.min(d(i + 1)(j) + 1, d(i)(j + 1) + 1)), // insert / delete
          d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)) // transpose
      }
      lastRow.put(a.charAt(i - 1), i)
    }
    d(n + 1)(m + 1).toLong
  }

  def hamming(l: UTF8String, r: UTF8String): Long = {
    val a = l.toString
    val b = r.toString
    if (a.length != b.length)
      throw new IllegalArgumentException(
        "Mismatch Function: Strings must be of equal length!")
    var i = 0
    var diff = 0L
    while (i < a.length) {
      if (a.charAt(i) != b.charAt(i)) diff += 1
      i += 1
    }
    diff
  }
}

abstract class StrDistExpression extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  /** Fully-qualified kernel method, e.g. "graft.fm.StrDistOps.jaccard". */
  protected def kernel: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"$kernel($l, $r)")
}

case class JaccardSim(left: Expression, right: Expression) extends StrDistExpression {
  override def prettyName: String = "jaccard"
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "graft.fm.StrDistOps.jaccard"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StrDistOps.jaccard(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class JaroSim(left: Expression, right: Expression) extends StrDistExpression {
  override def prettyName: String = "jaro_similarity"
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "graft.fm.StrDistOps.jaro"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StrDistOps.jaro(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class JaroWinklerSim(left: Expression, right: Expression) extends StrDistExpression {
  override def prettyName: String = "jaro_winkler_similarity"
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "graft.fm.StrDistOps.jaroWinkler"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StrDistOps.jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class DamerauLevenshtein(left: Expression, right: Expression) extends StrDistExpression {
  override def prettyName: String = "damerau_levenshtein"
  override def dataType: DataType = LongType
  override protected def kernel: String = "graft.fm.StrDistOps.damerauLevenshtein"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StrDistOps.damerauLevenshtein(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class HammingDist(left: Expression, right: Expression) extends StrDistExpression {
  override def prettyName: String = "hamming"
  override def dataType: DataType = LongType
  override protected def kernel: String = "graft.fm.StrDistOps.hamming"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StrDistOps.hamming(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
