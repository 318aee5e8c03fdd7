package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** st_contains(wkt, x, y): point-in-polygon as a native Catalyst expression
  * (SURVEY.md §7: custom expressions only for geometry predicates Spark
  * lacks). Null-safe ternary; the parsed polygon is memoized per WKT string
  * so a constant AOI parses once per task, not once per row.
  *
  * CodegenFallback is acceptable here: the expression sits behind the
  * envelope-overlap pre-filter (the hot path prunes tiles by bbox with
  * codegen'd comparisons; exact PIP runs only on boundary tiles).
  */
case class PointInPolygon(wktExpr: Expression, xExpr: Expression, yExpr: Expression,
                          envApplied: Boolean = false)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = wktExpr
  override def second: Expression = xExpr
  override def third: Expression = yExpr

  override def dataType: DataType = BooleanType
  override def nullable: Boolean =
    wktExpr.nullable || xExpr.nullable || yExpr.nullable

  @transient private lazy val cache =
    collection.mutable.HashMap.empty[String, Seq[Wkt.Polygon]]

  override protected def nullSafeEval(wkt: Any, x: Any, y: Any): Any = {
    val s = wkt.asInstanceOf[UTF8String].toString
    val polys = cache.getOrElseUpdate(s, Wkt.parse(s))
    Wkt.contains(polys, x.asInstanceOf[Double], y.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(wktExpr = newFirst, xExpr = newSecond, yExpr = newThird)
}

object GeoExpressions {
  /** Column wrapper: st_contains(geomWkt, x, y). */
  def st_contains(wkt: Column, x: Column, y: Column): Column =
    Bridge.toColumn(PointInPolygon(
      Bridge.toExpression(wkt),
      Bridge.toExpression(x),
      Bridge.toExpression(y)))
}
