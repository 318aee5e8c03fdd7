package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Threshold-bounded Levenshtein: the EXACT character edit distance when
  * `lev(a,b)·den ≤ num·max(|a|,|b|)`, else -1 — the verification kernel of
  * a fuzzy-dedup pass, where only distances under the accept threshold
  * matter and everything above it is discarded anyway.
  *
  * Why not the built-in `levenshtein`: it fills the full |a|·|b| DP table
  * per pair. A dedup verify stage evaluates millions of CANDIDATE pairs
  * that are already near-duplicates (q139 sees 76k pairs at sf0.1), so
  * three classical bounds cut almost all of that work while returning the
  * SAME accepted relation:
  *   1. common prefix/suffix stripping (distance-preserving) — template
  *      near-dups differ in a small middle region, so the DP shrinks to
  *      that region;
  *   2. the length gap |len(a)−len(b)| > k rejects without any DP
  *      (it lower-bounds the distance);
  *   3. an Ukkonen band of width 2k+1 with row-min early abandon — cells
  *      farther than k off-diagonal cannot influence any value ≤ k
  *      (Ukkonen '85, public algorithm).
  *
  * Distances ≤ k are exact under all three, so filtering the -1 sentinel
  * yields exactly the rows a full Levenshtein + threshold filter accepts —
  * the DuckDB oracle computes it that way. Distance is over Java chars
  * (UTF-16 units) — identical to code points on BMP text, the corpus
  * contract shared with `levenshtein` on both engines for ASCII data.
  */
case class EditWithinExpr(left: Expression, right: Expression,
                          num: Long, den: Long)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType &&
        num >= 0 && den > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"edit_within arguments must be STRING, STRING with den > 0; got " +
        s"${left.dataType.sql}, ${right.dataType.sql}, num=$num, den=$den")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EditWithinExpr.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], num, den)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EditWithinExpr.compute($a, $b, ${num}L, ${den}L);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object EditWithinExpr {

  private val Inf = Int.MaxValue / 2

  /** The bounded-DP kernel (shared by eval and generated code). */
  def compute(ua: UTF8String, ub: UTF8String, num: Long, den: Long): Long = {
    val sa = ua.toString
    val sb = ub.toString
    val la0 = sa.length
    val lb0 = sb.length
    val maxlen = math.max(la0, lb0)
    val k = (num * maxlen / den).toInt
    if (math.abs(la0 - lb0) > k) return -1L
    // distance-preserving strip of the common prefix and suffix
    val minLen = math.min(la0, lb0)
    var s = 0
    while (s < minLen && sa.charAt(s) == sb.charAt(s)) s += 1
    var e = 0
    while (e < minLen - s && sa.charAt(la0 - 1 - e) == sb.charAt(lb0 - 1 - e)) e += 1
    val la = la0 - s - e
    val lb = lb0 - s - e
    if (la == 0) return if (lb <= k) lb.toLong else -1L
    if (lb == 0) return if (la <= k) la.toLong else -1L
    // banded DP over the stripped middle: only cells within k of the
    // diagonal can hold values <= k; margins are Inf so out-of-band reads
    // are harmless; a row whose band minimum exceeds k can never recover
    var prev = new Array[Int](lb + 1)
    var cur = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = if (j <= k) j else Inf; j += 1 }
    var i = 1
    while (i <= la) {
      val jLo = math.max(1, i - k)
      val jHi = math.min(lb, i + k)
      if (jLo > 1) cur(jLo - 1) = Inf
      cur(0) = if (i <= k) i else Inf
      var rowMin = if (jLo == 1) cur(0) else Inf
      var jj = jLo
      while (jj <= jHi) {
        val cost = if (sa.charAt(s + i - 1) == sb.charAt(s + jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = cur(jj - 1) + 1
        if (ins < v) v = ins
        cur(jj) = v
        if (v < rowMin) rowMin = v
        jj += 1
      }
      if (jHi < lb) cur(jHi + 1) = Inf
      if (rowMin > k) return -1L
      val t = prev; prev = cur; cur = t
      i += 1
    }
    val d = prev(lb)
    if (d <= k) d.toLong else -1L
  }
}
