package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** The sequential dot product as a native expression with codegen —
  * value-identical to the HOF chain `aggregate(zip_with(a,b,_*_), 0.0, _+_)`
  * (Portable.dotFoldHof) and to the DuckDB list_reduce twin: same products,
  * same left-to-right summation order, so results are bit-identical.
  * NULL result when either side is NULL, lengths differ (zip_with pads
  * with null and null poisons the fold) or any element is NULL.
  *
  * Why: the HOF form evaluates two interpreted lambdas per element; this
  * is one JIT'd loop per pair, inlined into whole-stage codegen. Cosine
  * similarity calls this three times per pair (dot, |a|², |b|²) — the hot
  * inner loop of the embedding dedup/ANN operators (q34–q36, q49, q53).
  */
case class DotFoldExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_fold arguments must be ARRAY<DOUBLE>, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotFoldExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $r = graft.functions.DotFoldExpr.dot($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotFoldExpr {
  /** The fold kernel (shared by eval and generated code). Returns null
    * (boxed) for length mismatch or null elements — the HOF semantics. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
