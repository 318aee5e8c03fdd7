package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.config.Settings
import graft.geo.GeoJson
import graft.model.RasterModel
import graft.raster.Resample

/** Source-side parity: settings loader (S6), GeoJSON AOI read (S5),
  * binary asset read (S2), and the reprojection warp (R1/R2). */
class SourcesSpec extends SparkSpec {

  private val refYaml =
    """aoi:
      |  bbox: [25.13, 60.32, 25.63, 60.63]
      |  geojson_path: "data/aoi/boundary.geojson"
      |  bbox_pad_km: 0
      |
      |dates:
      |  start: "2022-06-01"
      |  end:   "2022-12-31"
      |
      |download:
      |  output_dir: "data/raw_landsat"
      |  max_cloud_cover: 10
      |  max_items: 10
      |
      |stac:
      |  endpoint: "https://example.invalid/stac/v1"
      |  collection: "landsat-c2-l2"
      |
      |search:
      |  use_intersects: true
      |
      |products:
      |  reproject_crs: "EPSG:3857"
      |  build_overviews: true""".stripMargin

  test("settings loader parses the reference YAML shape (S6)") {
    val s = Settings.fromString(refYaml)
    assert(s.aoi.bbox == Seq(25.13, 60.32, 25.63, 60.63))
    assert(s.dates.start == "2022-06-01" && s.dates.end == "2022-12-31")
    assert(s.download.maxCloudCover == 10.0 && s.download.maxItems == 10)
    assert(s.stac.collection == "landsat-c2-l2")
    assert(s.useIntersects && s.products.buildOverviews)
    assert(s.products.reprojectCrs == "EPSG:3857")
  }

  test("GeoJSON FeatureCollection -> aoi DataFrame with WKT + envelope (S5)") {
    val geojson =
      """{"type": "FeatureCollection", "features": [{"type": "Feature",
        |"geometry": {"type": "Polygon", "coordinates":
        |[[[25.63, 60.32], [25.63, 60.63], [25.13, 60.63], [25.13, 60.32], [25.63, 60.32]]]},
        |"properties": {"name": "AOI", "crs": "EPSG:4326"}}]}""".stripMargin
    val f = Files.createTempFile("aoi", ".geojson")
    Files.writeString(f, geojson)
    val aoi = GeoJson.readAoi(spark, f.toString)
    val r = aoi.head
    assert(r.getAs[String]("name") == "AOI")
    assert(r.getAs[String]("geom_wkt").startsWith("POLYGON"))
    assert(r.getAs[Double]("minx") == 25.13 && r.getAs[Double]("maxy") == 60.63)
    // the parsed WKT must contain the bbox corners
    val polys = graft.geo.Wkt.parse(r.getAs[String]("geom_wkt"))
    assert(graft.geo.Wkt.contains(polys, 25.4, 60.5))
    assert(!graft.geo.Wkt.contains(polys, 24.0, 60.5))
  }

  test("binary asset read (S2): binaryFile source + size validation (F10)") {
    val dir = Files.createTempDirectory("assets")
    Files.write(dir.resolve("scene1_B4.bin"), Array.fill[Byte](2048)(1))
    Files.write(dir.resolve("scene1_B5.bin"), Array.fill[Byte](16)(2))
    val files = spark.read.format("binaryFile").load(dir.toString)
    assert(files.count() == 2)
    // validation predicate analog: min-size floor drops the short file
    val valid = files.filter(col("length") >= 1024)
    assert(valid.count() == 1)
    assert(valid.head.getAs[Array[Byte]]("content").length == 2048)
  }

  test("reprojection warp 4326 -> 3857: bounds transform, values preserved, no-op elision (R1/R2)") {
    import spark.implicits._
    val tiles = Seq(RasterModel.BandTile("S", "ndvi", 0, 0, 10, 10, 4326,
      Seq(0.1, 0, 25.0, 0, -0.1, 61.0), Some(-9999.0),
      Seq.fill(100)(Some(0.5f)))).toDF().as[RasterModel.BandTile]
    val out = Resample.reprojectTiles(spark, tiles, 3857, resM = 2000.0).collect().head
    assert(out.epsg == 3857)
    // origin x must be webmercator of lon 25.0 (~2782987)
    assert(math.abs(out.transform(2) - 2782987.27) < 1.0)
    // constant band: all sampled interior values still 0.5
    val vals = out.pixels.flatten
    assert(vals.nonEmpty && vals.forall(_ == 0.5f))
    // no-op elision: same-CRS reprojection returns tiles unchanged
    val same = Resample.reprojectTiles(spark, tiles, 4326).collect().head
    assert(same.transform == Seq(0.1, 0, 25.0, 0, -0.1, 61.0))
  }
}
