package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThanOrEqual}
import graft.geo.{GeoExpressions, PointInPolygon}
import graft.plans.EnvelopePrefilter

/** The envelope-prefilter optimizer rule: constant-polygon PIP filters get
  * range conjuncts (codegen + parquet-pushable); semantics unchanged. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private val wkt = "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))"

  test("rule adds envelope range conjuncts and marks the PIP applied") {
    val df = Seq((1.0, 1.0), (5.0, 5.0), (9.0, 9.0)).toDF("x", "y")
      .filter(GeoExpressions.st_contains(lit(wkt), col("x"), col("y")))
    val before = df.queryExecution.analyzed
    val after = EnvelopePrefilter(before)
    assert(after != before, "rule should rewrite the plan")
    val flat = after.expressions.flatMap(_.collect { case e => e })
    assert(flat.exists(_.isInstanceOf[GreaterThanOrEqual]))
    assert(flat.exists(_.isInstanceOf[LessThanOrEqual]))
    assert(flat.collect { case p: PointInPolygon => p }.forall(_.envApplied))
    // idempotent: second application is a no-op
    assert(EnvelopePrefilter(after) == after)
  }

  test("rewritten filter is semantically unchanged") {
    val data = Seq((1.0, 5.0), (5.0, 5.0), (7.9, 7.9), (8.1, 5.0), (5.0, 1.9))
    val df = data.toDF("x", "y")
      .filter(GeoExpressions.st_contains(lit(wkt), col("x"), col("y")))
    val expect = data.filter { case (x, y) => x >= 2 && x <= 8 && y >= 2 && y <= 8 }
    assert(df.as[(Double, Double)].collect().toSet == expect.toSet)
    val rewritten = spark.sessionState.executePlan(
      EnvelopePrefilter(df.queryExecution.analyzed)).executedPlan
    // execute the rewritten plan and compare row sets
    val rows = rewritten.executeCollect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(rows == expect.toSet)
  }

  test("custom expressions are callable from spark.sql after registration") {
    graft.plans.GraftExtensions.register(spark)
    Seq((5.0, 5.0), (9.0, 9.0)).toDF("x", "y").createOrReplaceTempView("pts")
    val in = spark.sql(s"SELECT x FROM pts WHERE st_contains('$wkt', x, y)")
      .as[Double].collect()
    assert(in.toSeq == Seq(5.0))
    // SQL char_fold/dot_fold equal their Column-API twins
    val h = spark.sql("SELECT char_fold('hello')").as[Long].head
    val hc = Seq("hello").toDF("s")
      .select(graft.functions.Portable.charFold(col("s"))).as[Long].head
    assert(h == hc)
    val dot = spark.sql(
      "SELECT dot_fold(array(1.0D, 2.0D), array(3.0D, 4.0D))").as[Double].head
    assert(dot == 11.0)
    val sic = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 7L, 9L), array(3L, 4L, 9L))")
      .as[Long].head
    assert(sic == 2L)
  }
}
