package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** DSv2 scene-catalog source: filter/column/limit pushdown reach the
  * "server" (the partition reader), matching the reference's STAC query
  * parameter behavior. */
class SceneCatalogSourceSpec extends SparkSpec {

  private def catalog(n: Int) = spark.read
    .format("graft.sources.SceneCatalogSource")
    .option("scenes", n.toString).load()

  test("full scan returns all scenes with the declared schema") {
    val df = catalog(400)
    assert(df.count() == 400)
    assert(df.columns.toSeq ==
      Seq("scene_id", "sensor", "datetime", "cloud_cover", "epsg"))
  }

  test("cloud and sensor predicates are pushed to the source scan") {
    val df = catalog(400).filter(col("cloud_cover") <= 10.0 &&
                                 col("sensor") === "LC08")
    val rows = df.collect()
    // client-side recompute of the server's generator
    val expect = (0 until 400).map(graft.sources.SceneCatalogSource.scene)
      .count { case (_, sensor, _, cloud, _) => cloud <= 10.0 && sensor == "LC08" }
    assert(rows.length == expect && expect > 0)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collect { case b: BatchScanExec => b }.head
    val desc = scan.scan.description()
    assert(desc.contains("cloud_cover") && desc.contains("sensor"),
      s"filters not pushed: $desc")
  }

  test("column pruning reaches the reader") {
    val df = catalog(100).select("scene_id")
    assert(df.schema.fieldNames.toSeq == Seq("scene_id"))
    assert(df.distinct().count() == 100)
  }

  test("limit pushdown bounds server-side emission") {
    val df = catalog(100000).limit(5)
    assert(df.collect().length == 5)
  }

  test("composes with the extract-stage pipeline filters (F1/F4)") {
    val picked = catalog(1000)
      .filter(col("cloud_cover") <= 10.0)
      .filter(!col("scene_id").startsWith("LE07"))
      .orderBy("scene_id").limit(10)
    assert(picked.count() == 10)
    assert(picked.filter(col("sensor") === "LE07").count() == 0)
  }
}
