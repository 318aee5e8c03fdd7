package graft

import org.apache.spark.sql.functions._
import graft.config.Settings
import graft.model.RasterModel
import graft.pipeline.NdviPipeline

/** The reference's full run (main.py:94-158) through NdviPipeline.run on
  * the replicated fixtures: catalog predicates pick the good scene, the
  * kernel+clip+mean produce the golden value, upserts land, and a second
  * run is idempotent. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private val settings = Settings.fromString(
    """aoi:
      |  bbox: [0.5, -9.5, 9.5, -0.5]
      |dates:
      |  start: "2022-06-01"
      |  end:   "2022-12-31"
      |download:
      |  max_cloud_cover: 10
      |  max_items: 10
      |products:
      |  reproject_crs: "EPSG:3857"
      |  build_overviews: true""".stripMargin)

  private def catalog = Seq(
    ("TEST_SCENE", 5.0, "2022-06-10 00:00:00"),
    ("CLOUDY", 90.0, "2022-06-10 00:00:00"),
    ("LE07_X", 1.0, "2022-06-10 00:00:00"))
    .toDF("scene_id", "cloud_cover", "dt")
    .withColumn("datetime", col("dt").cast("timestamp"))

  test("full pipeline run: golden mean, product tables, summary, idempotent reload") {
    val tiles = RasterModel.dummyConstant(spark)
    val aoi = RasterModel.aoiOverlap(spark)
    val emptyFull = Seq.empty[(String, java.sql.Date)]
      .toDF("scene_id", "acquisition_date")
    val emptyClipped = Seq.empty[(String, Long, Double)]
      .toDF("scene_id", "aoi_id", "mean_ndvi")

    // K11: per-run timestamped log file + C2 footprint sanity line
    val logDir = java.nio.file.Files.createTempDirectory("graft_run").toString
    val runLog = graft.sink.RunLog.open(logDir, echo = false)
    val r = try NdviPipeline.run(spark, settings, catalog, tiles, aoi,
      emptyFull, emptyClipped, runLog) finally runLog.close()

    val logLines = new String(java.nio.file.Files.readAllBytes(runLog.path), "UTF-8")
    assert(runLog.path.getFileName.toString.matches("pipeline_\\d{8}_\\d{6}\\.log"))
    assert(logLines.contains("[INFO] graft.pipeline: Raster bounds (WGS84): (0.0, -10.0, 10.0, 0.0)"))
    assert(logLines.contains("Run summary: total=1 succeeded=1 failed=0"))

    assert(r.summary.total == 1 && r.summary.succeeded == 1 && r.summary.failed == 0)
    val m = r.mean.head  // (scene_id, aoi_id, mean_ndvi, n_valid)
    assert(m.getString(0) == "TEST_SCENE")
    assert(m.getLong(1) == 1L)
    assert(math.abs(m.getDouble(2) - -0.18965584) < 1e-6)
    assert(m.getLong(3) == 8100)                       // clipped interior
    assert(r.full.count() == 1)
    assert(r.full.head.getAs[java.sql.Date]("acquisition_date").toString == "2022-06-10")
    assert(r.clipped.count() == 1)
    assert(r.viz.count() == 1)
    val vizRow = r.viz.head
    assert(vizRow.getAs[Int]("epsg") == 3857)
    assert(vizRow.getAs[String]("scene_id") == "TEST_SCENE#1")
    // full [2,4,8,16,32] pyramid
    assert(r.overviews.get.select("overview_factor").distinct()
      .collect().map(_.getInt(0)).toSet == Set(2, 4, 8, 16, 32))

    // reload: K4 does nothing for the existing scene, K5 merges in place
    val r2 = NdviPipeline.run(spark, settings, catalog, tiles, aoi,
      r.full, r.clipped)
    assert(r2.full.count() == 1)
    assert(r2.clipped.count() == 1)
  }
}
