package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.unsafe.types.UTF8String
import graft.geo.{PointInPolygon, Wkt}

/** The engine's Catalyst surface (SURVEY.md §4 "bbox-overlap pruning needs
  * a small custom Rule"): rewrite exact point-in-polygon filters on a
  * CONSTANT polygon into envelope-range conjuncts + the exact test.
  *
  *   Filter(st_contains('POLYGON…', x, y))
  *   ⇒ Filter(x >= minx AND x <= maxx AND y >= miny AND y <= maxy
  *            AND st_contains…)
  *
  * The envelope conjuncts are plain comparisons: whole-stage-codegen'd,
  * and when x/y are scan columns they reach the parquet reader as
  * PushedFilters, so row groups prune on min/max stats — the reference's
  * "only tiles intersecting the AOI are processed" short-circuit
  * (compute_ndvi.py:128-134) at the storage layer. The exact (interpreted)
  * PIP then runs only on envelope survivors. Correctness never depends on
  * the rule (envelope ⊇ polygon).
  */
object EnvelopePrefilter extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      f.copy(condition = cond.transformUp {
        case p @ PointInPolygon(wktLit: Literal, x, y, false) if wktLit.value != null =>
          val polys = Wkt.parse(wktLit.value.asInstanceOf[UTF8String].toString)
          val (minx, miny, maxx, maxy) = Wkt.envelope(polys)
          val env = And(
            And(GreaterThanOrEqual(x, Literal(minx, DoubleType)),
                LessThanOrEqual(x, Literal(maxx, DoubleType))),
            And(GreaterThanOrEqual(y, Literal(miny, DoubleType)),
                LessThanOrEqual(y, Literal(maxy, DoubleType))))
          And(env, p.copy(envApplied = true))
      })
  }
}

/** Session wiring: SparkSession.builder().withExtensions(new GraftExtensions).
  *
  * Besides the optimizer rule, the engine's custom expressions register in
  * the SQL function registry, so `spark.sql` users get the same surface as
  * the Column API: `st_contains(wkt, x, y)`, `char_fold(s)` (the portable
  * dedup hash) and `dot_fold(a, b)` (the sequential-fold dot product). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => EnvelopePrefilter)
    e.injectOptimizerRule(_ => MetaAggregates)
    // SQL DDL face: ALTER TABLE '<path>' … / OPTIMIZE / VACUUM over
    // graft tables; every unrecognized statement delegates untouched
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // named graft tables: SELECT/INSERT resolve through the TableCatalog
    // (graft.catalog.GraftCatalog); this rule swaps the resolved V2
    // relation for the engine's DSv1 read path (stats pruning,
    // truthful sizeInBytes, MetaAggregates)
    e.injectResolutionRule(session =>
      graft.catalog.GraftNamedTableReads(session))
    GraftExtensions.sqlFunctions.foreach(e.injectFunction)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  /** The SQL-registered expression surface, shared by the builder-time
    * extension and [[register]] (for sessions that already exist). */
  val sqlFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("st_contains"),
      new ExpressionInfo(classOf[PointInPolygon].getName, "st_contains"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "st_contains(wkt, x, y)")
        PointInPolygon(args(0), args(1), args(2))
      }),
    (FunctionIdentifier("char_fold"),
      new ExpressionInfo(classOf[graft.functions.CharFoldExpr].getName, "char_fold"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "char_fold(s)")
        graft.functions.CharFoldExpr(args.head)
      }),
    (FunctionIdentifier("dot_fold"),
      new ExpressionInfo(classOf[graft.functions.DotFoldExpr].getName, "dot_fold"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_fold(a, b)")
        graft.functions.DotFoldExpr(args(0), args(1))
      }),
    (FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(
        classOf[graft.functions.SortedIntersectCountExpr].getName,
        "sorted_intersect_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sorted_intersect_count(a, b)")
        graft.functions.SortedIntersectCountExpr(args(0), args(1))
      }),
    (FunctionIdentifier("edit_within"),
      new ExpressionInfo(
        classOf[graft.functions.EditWithinExpr].getName, "edit_within"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "edit_within(a, b, num, den)")
        def intLit(e: Expression, name: String): Long = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case _ => throw new IllegalArgumentException(
            s"edit_within: $name must be an integer literal")
        }
        graft.functions.EditWithinExpr(args(0), args(1),
          intLit(args(2), "num"), intLit(args(3), "den"))
      }),
    (FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(
        classOf[graft.functions.JaroWinklerExpr].getName, "jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jaro_winkler(a, b)")
        graft.functions.JaroWinklerExpr(args(0), args(1))
      }))

  /** Register the SQL functions on a live session (builder-time
    * withExtensions is not available after getOrCreate). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlFunctions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
