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

  test("versioned sinks: snapshot reader survives a stage-3 commit; time travel returns the pre-merge ndvi_clipped") {
    import graft.sink.VersionedTable
    val tiles = RasterModel.dummyConstant(spark)
    val aoi = RasterModel.aoiOverlap(spark)
    val emptyFull = Seq.empty[(String, java.sql.Date)]
      .toDF("scene_id", "acquisition_date")
    val emptyClipped = Seq.empty[(String, Long, Double)]
      .toDF("scene_id", "aoi_id", "mean_ndvi")
    val root = java.nio.file.Files.createTempDirectory("graft_vrun").toString

    // run 1 commits version 1 of every product table, in stage order
    val r1 = NdviPipeline.run(spark, settings, catalog, tiles, aoi,
      emptyFull, emptyClipped)
    val v1 = NdviPipeline.commitRun(spark, r1, root)
    assert(v1 == Map("ndvi_full" -> 1, "ndvi_clipped" -> 1, "ndvi_viz" -> 1))
    val meanV1 = VersionedTable.read(spark, s"$root/ndvi_clipped")
      .head.getDouble(2)

    // a concurrent reader resolves ndvi_clipped BEFORE the reload commits:
    // it is bound to version 1's immutable file list
    val snapshot = VersionedTable.read(spark, s"$root/ndvi_clipped")

    // run 2: the existing clipped mean is doctored so the K5 merge CHANGES
    // the row — the reload's stage-3 commit publishes version 2
    val doctored = VersionedTable.read(spark, s"$root/ndvi_clipped")
      .withColumn("mean_ndvi", col("mean_ndvi") + 1.0)
    val r2 = NdviPipeline.run(spark, settings, catalog, tiles, aoi,
      VersionedTable.read(spark, s"$root/ndvi_full"), doctored)
    val v2 = NdviPipeline.commitRun(spark, r2, root)
    assert(v2("ndvi_clipped") == 2)

    // the merge kept the incoming (fresh) mean: the live table changed...
    val liveMean = VersionedTable.read(spark, s"$root/ndvi_clipped")
      .head.getDouble(2)
    assert(math.abs(liveMean - meanV1) < 1e-9)
    // ...the doctored pre-merge value is what v2 replaced
    assert(math.abs(doctored.head.getDouble(2) - (meanV1 + 1.0)) < 1e-9)
    // the concurrent reader still reads version 1's files (snapshot
    // isolation through the commit)
    assert(snapshot.count() == 1 &&
      math.abs(snapshot.head.getDouble(2) - meanV1) < 1e-9)
    // time travel: version 1 IS the pre-reload ndvi_clipped
    val travelled = VersionedTable.read(spark, s"$root/ndvi_clipped", Some(1))
    assert(travelled.count() == 1 &&
      math.abs(travelled.head.getDouble(2) - meanV1) < 1e-9)
    // history bounded: expire keeps the newest only, the v1 files go away
    val (mans, files) = VersionedTable.expire(spark, s"$root/ndvi_clipped", keepLast = 1)
    assert(mans == 1 && files >= 1)
    assert(VersionedTable.versions(spark, s"$root/ndvi_clipped") == Seq(2))
  }
}
