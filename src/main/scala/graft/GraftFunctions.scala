package graft

import org.apache.spark.sql.SparkSession
import graft.geo.PointInPolygon
import graft.raster.NdviKernelExpr

/** SQL-surface registration: the engine's custom expressions as session
  * functions, so `spark.sql` users get the same operators as the Scala
  * API (st_contains, ndvi_kernel). Idempotent. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("st_contains",
      exprs => PointInPolygon(exprs(0), exprs(1), exprs(2)), "built-in")
    registry.createOrReplaceTempFunction("ndvi_kernel",
      exprs => NdviKernelExpr(exprs), "built-in")
  }
}
