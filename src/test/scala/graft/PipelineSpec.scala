package graft

import org.apache.spark.sql.functions._
import graft.model.RasterModel
import graft.pipeline.NdviPipeline
import graft.sink.Writers

/** End-to-end pipeline composition + sink conflict semantics
  * (FIXTURES.md §4: lookup joins, upsert idempotency, AOI fallback). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("transform stage: dummy scene through ndvi+clip+mean") {
    val (ndvi, clipped, mean) = NdviPipeline.transformStage(
      RasterModel.dummyConstant(spark), RasterModel.aoiOverlap(spark))
    assert(ndvi.count() == 1)
    assert(clipped.count() == 1)
    val m = mean.head
    // 8100 interior pixels, all -0.18965582
    assert(m.getLong(2) == 8100)
    assert(math.abs(m.getDouble(1) - -0.18965582) < 1e-6)
  }

  test("filterCatalog applies F1-F4 semantics") {
    val cat = Seq(
      ("LC08_A", 5.0, "2022-06-10 00:00:00"),
      ("LC08_B", 50.0, "2022-06-10 00:00:00"),   // cloud > max
      ("LC08_C", 5.0, "2021-01-01 00:00:00"),    // out of range
      ("LE07_D", 5.0, "2022-06-10 00:00:00"))    // SLC-off sensor
      .toDF("scene_id", "cloud_cover", "dt")
      .withColumn("datetime", col("dt").cast("timestamp"))
    val got = NdviPipeline.filterCatalog(cat, 10.0, "2022-06-01", "2022-12-31", 10)
      .select("scene_id").as[String].collect().toSet
    assert(got == Set("LC08_A"))
  }

  test("upsert semantics: double-load leaves counts unchanged (K4) and merge updates in place (K5)") {
    val full = Seq(("S1", 1), ("S2", 2)).toDF("scene_id", "v")
    val incoming = Seq(("S2", 99), ("S3", 3)).toDF("scene_id", "v")
    // insert-if-absent: S2 not duplicated, S3 added
    val afterInsert = full.unionByName(
      Writers.insertIfAbsent(full, incoming, Seq("scene_id")))
    assert(afterInsert.count() == 3)
    assert(afterInsert.filter(col("scene_id") === "S2" && col("v") === 2).count() == 1)
    // double-load: idempotent
    val again = afterInsert.unionByName(
      Writers.insertIfAbsent(afterInsert, incoming, Seq("scene_id")))
    assert(again.count() == 3)
    // merge: S2 updated in place, S3 added
    val merged = Writers.merge(full, incoming, Seq("scene_id"), "scene_id")
    assert(merged.count() == 3)
    assert(merged.filter(col("scene_id") === "S2").head.getInt(1) == 99)
  }

  test("splitRejects carries reason (K7)") {
    val df = Seq(1, -2, 3).toDF("v")
    val (ok, bad) = Writers.splitRejects(df, col("v") > 0, "negative")
    assert(ok.count() == 2 && bad.count() == 1)
    assert(bad.head.getString(1) == "negative")
  }
}
