package graft

import org.apache.spark.sql.functions._
import graft.model.RasterModel
import graft.raster.{Clip, NdviKernel}

/** Multi-tile scene through the clip: wholly-outside tiles are DROPPED by
  * the envelope join (the "crop" half of C6), boundary tiles get exact
  * per-pixel masking, interior tiles pass through intact. */
class MultiTileClipSpec extends SparkSpec {
  import spark.implicits._

  // 2×2 grid of 4×4-pixel tiles, 1-degree pixels, scene spans (0,-8)-(8,0).
  // TileSize is 256 in the model, so per-tile origins use the transform's
  // c/f directly (one scene per tile row/col here → use distinct scenes
  // per grid cell with tile (0,0), the per-file layout of the reference).
  private def tile(scene: String, ox: Double, oy: Double, band: String, v: Float) =
    RasterModel.BandTile(scene, band, 0, 0, 4, 4, 4326,
      Seq(1.0, 0, ox, 0, -1.0, oy), Some(0.0), Seq.fill(16)(Some(v)))

  private val tiles = Seq(
    // four scene-tiles at origins (0,0), (4,0), (0,-4), (4,-4)
    tile("T00", 0, 0, "red", 1000f), tile("T00", 0, 0, "nir", 3000f),
    tile("T10", 4, 0, "red", 1000f), tile("T10", 4, 0, "nir", 3000f),
    tile("T01", 0, -4, "red", 1000f), tile("T01", 0, -4, "nir", 3000f),
    tile("T11", 4, -4, "red", 1000f), tile("T11", 4, -4, "nir", 3000f))

  test("clip drops outside tiles, masks boundary tiles, keeps interior") {
    // AOI box covering all of T00 and the left half of T10; nothing of
    // the bottom row.
    val aoi = Seq(RasterModel.Aoi(1L, "AOI",
      "POLYGON ((0 -4, 6 -4, 6 0, 0 0, 0 -4))", 0.0, -4.0, 6.0, 0.0)).toDF()
    val ndvi = NdviKernel.computeNdvi(tiles.toDF())
    assert(ndvi.count() == 4)
    val clipped = Clip.clipToAoi(ndvi, aoi)
    val byScene = clipped.collect().map { r =>
      val px = r.getSeq[Any](r.fieldIndex("pixels"))
        .map(v => Option(v)).toSeq
      r.getAs[String]("scene_id") -> px.count(_.isDefined)
    }.toMap
    // bottom row (T01, T11 at y in [-8,-4]): envelope-disjoint → dropped...
    // but their tile rows at oy=-4 span y in (-8,-4) — envelope test uses
    // closed intervals so the shared edge keeps them; pixel centers at
    // y=-4.5.. are outside → fully masked rows may remain with 0 kept px.
    assert(byScene("T00") == 16)                  // fully inside
    assert(byScene("T10") == 8)                   // left half (x<6) kept
    assert(byScene.getOrElse("T01", 0) == 0)      // nothing kept
    assert(byScene.getOrElse("T11", 0) == 0)
  }

  test("reprojectAoi lets a 4326 AOI clip a projected (3857) scene") {
    // tile in Web Mercator covering lon 0..~0.036deg, lat ~0..-0.036deg
    val m = 4000.0 / 4  // 1km pixels, 4x4 tile from (0,0) going south-east
    val tiles3857 = Seq(RasterModel.BandTile("P", "red", 0, 0, 4, 4, 3857,
        Seq(1000.0, 0, 0.0, 0, -1000.0, 0.0), Some(0.0), Seq.fill(16)(Some(1000f))),
      RasterModel.BandTile("P", "nir", 0, 0, 4, 4, 3857,
        Seq(1000.0, 0, 0.0, 0, -1000.0, 0.0), Some(0.0), Seq.fill(16)(Some(3000f)))).toDF()
    // AOI in degrees covering roughly the left half of the tile
    val aoiDeg = Seq(RasterModel.Aoi(1L, "AOI",
      "POLYGON ((0 -0.04, 0.018 -0.04, 0.018 0.01, 0 0.01, 0 -0.04))",
      0.0, -0.04, 0.018, 0.01)).toDF()
    val ndvi = NdviKernel.computeNdvi(tiles3857)
    // unprojected AOI: degree-sized polygon keeps no pixel centers (all
    // centers sit 500+ meters from the origin, far outside 0.018 "units")
    val wrong = Clip.clipToAoi(ndvi, aoiDeg)
    val wrongKept = wrong.select("pixels").collect()
      .flatMap(_.getSeq[Any](0)).count(_ != null)
    assert(wrongKept == 0, s"degree AOI unexpectedly kept $wrongKept pixels")
    // reprojected AOI clips the left half (0.018 deg ~ 2004m -> 2 columns)
    val aoiM = Clip.reprojectAoi(aoiDeg, 3857)
    val clipped = Clip.clipToAoi(ndvi, aoiM)
    val px = clipped.select("pixels").head.getSeq[Any](0).map(Option(_))
    assert(px.count(_.isDefined) == 8, s"kept ${px.count(_.isDefined)}")
  }

  test("mean over clipped scene counts only interior pixels") {
    val aoi = Seq(RasterModel.Aoi(1L, "AOI",
      "POLYGON ((0 -4, 6 -4, 6 0, 0 0, 0 -4))", 0.0, -4.0, 6.0, 0.0)).toDF()
    val clipped = Clip.clipToAoi(NdviKernel.computeNdvi(tiles.toDF()), aoi)
    val mean = NdviKernel.meanNdviPerScene(clipped)
      .filter(col("scene_id") === "T10").head
    assert(mean.getLong(2) == 8)
    assert(math.abs(mean.getDouble(1) - -0.18965584) < 1e-6)
  }

  test("zonalStats: mean per (AOI x date) over MANY AOIs in one pass") {
    // two dates x four scene-tiles; two overlapping AOIs — the left AOI
    // covers T00 + left half of T10, the right AOI covers only T10's
    // right column (x in [7, 8]); NDVI is constant per scene so expected
    // means are exact
    val aois = Seq(
      RasterModel.Aoi(1L, "L", "POLYGON ((0 -4, 6 -4, 6 0, 0 0, 0 -4))",
        0.0, -4.0, 6.0, 0.0),
      RasterModel.Aoi(2L, "R", "POLYGON ((7 -4, 8 -4, 8 0, 7 0, 7 -4))",
        7.0, -4.0, 8.0, 0.0)).toDF()
    val ndvi = NdviKernel.computeNdvi(tiles.toDF())
    val dated = ndvi
      .withColumn("acquisition_date",
        when(col("scene_id").isin("T00", "T10"), lit("2024-06-01"))
          .otherwise(lit("2024-06-02")).cast("date"))
    val z = Clip.zonalStats(dated, aois)
    val rows = z.collect().map(r =>
      (r.getLong(0), r.getDate(1).toString) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]), r.getLong(3))).toMap
    val expectNdvi = {
      val red = 1000 * 2.75e-5f - 0.2f; val nir = 3000 * 2.75e-5f - 0.2f
      ((nir - red) / (nir + red)).toDouble
    }
    // AOI 1 on 2024-06-01: T00 fully (16 px) + T10 left half (8 px)
    val (m1, n1) = rows((1L, "2024-06-01"))
    assert(n1 == 24 && math.abs(m1.get - expectNdvi) < 1e-6)
    // AOI 2 on 2024-06-01: T10's right column, 4 px
    val (m2, n2) = rows((2L, "2024-06-01"))
    assert(n2 == 4 && math.abs(m2.get - expectNdvi) < 1e-6)
    // bottom-row scenes (2024-06-02) share an envelope EDGE with both
    // AOIs, so pairs survive the prefilter with zero interior pixels —
    // the group reports n_valid = 0 and a null mean, never a wrong one
    Seq(1L, 2L).foreach { a =>
      rows.get((a, "2024-06-02")).foreach { case (m, n) =>
        assert(n == 0 && m.isEmpty)
      }
    }
    // exactly one result group per (AOI x date) — one aggregate, one pass
    assert(z.count() == rows.size)
  }
}
