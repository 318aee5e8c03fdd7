package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The portable char-fold hash as a native expression with codegen:
  * h = fold(0, (acc, cp) => (acc*31 + cp) % FoldMod) over Unicode code
  * points — value-identical to the HOF chain in Portable.charFold (which
  * splits into chars, maps ascii(), and folds interpreted) and to the
  * DuckDB twin (regexp_split_to_array + list_reduce).
  *
  * Why: the HOF chain evaluates four interpreted lambdas per character;
  * this is one JIT'd loop per string, inlined into whole-stage codegen via
  * doGenCode. For BMP text the two paths agree exactly; ASCII (the
  * document corpus) is trivially identical. (Astral-plane code points
  * split differently across engines in the HOF form too — the fold is
  * specified over code points.)
  */
case class CharFoldExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_fold argument must be STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    CharFoldExpr.fold(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharFoldExpr.fold($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object CharFoldExpr {
  /** The fold kernel (shared by eval and generated code). */
  def fold(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Portable.FoldMod
      i += Character.charCount(cp)
    }
    acc
  }
}
