package graft

import org.apache.spark.sql.functions._
import graft.geo.Wkt
import graft.model.RasterModel
import graft.raster.Clip

/** C4 geometry validity handling (reference compute_ndvi.py:115-126):
  * invalid AOI rings are repaired by node-splitting (the buffer(0) analog)
  * or rejected; a repaired bow-tie clips identically to its manual split. */
class GeometryRepairSpec extends SparkSpec {
  import spark.implicits._

  private val bowtie = "POLYGON ((1 -1, 9 -9, 9 -1, 1 -9, 1 -1))"
  // the bow-tie's even-odd region: left + right triangles meeting at (5,-5)
  private val manualSplit =
    "MULTIPOLYGON (((1 -1, 5 -5, 1 -9, 1 -1)), ((9 -9, 9 -1, 5 -5, 9 -9)))"

  test("isValid: simple ring valid; bow-tie and zero-area rings invalid") {
    assert(Wkt.isValid(Wkt.parse("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")))
    assert(!Wkt.isValid(Wkt.parse(bowtie)))
    assert(!Wkt.isValid(Wkt.parse("POLYGON ((0 0, 1 1, 2 2, 0 0))"))) // zero area
  }

  test("repair splits a bow-tie into its two simple triangles") {
    val fixed = Wkt.repair(Wkt.parse(bowtie))
    val rings = fixed.flatMap(_.rings)
    assert(rings.length == 2)
    assert(Wkt.isValid(fixed))
    // same envelope as the original
    assert(Wkt.envelope(fixed) == Wkt.envelope(Wkt.parse(bowtie)))
    // even-odd containment preserved at probe points
    val orig = Wkt.parse(bowtie)
    for (p <- Seq((2.0, -5.0), (8.0, -5.0), (5.0, -2.0), (5.0, -8.0), (0.5, -5.0)))
      assert(Wkt.contains(fixed, p._1, p._2) == Wkt.contains(orig, p._1, p._2), s"at $p")
  }

  test("repair of nothing-but-degenerate geometry throws (reference error path)") {
    intercept[IllegalArgumentException] {
      Wkt.repair(Wkt.parse("POLYGON ((0 0, 1 1, 2 2, 0 0))"))
    }
  }

  test("repaired bow-tie clip matches the manually-split oracle") {
    val tile = RasterModel.BandTile("S", "ndvi", 0, 0, 10, 10, 4326,
      Seq(1.0, 0.0, 0.0, 0.0, -1.0, 0.0), Some(-9999.0),
      Seq.fill(100)(Some(0.5f)))
    val tiles = Seq(tile).toDF()
    def aoiDf(wkt: String) = {
      val env = Wkt.envelope(Wkt.parse(wkt))
      Seq(RasterModel.Aoi(1L, "A", wkt, env._1, env._2, env._3, env._4)).toDF()
    }
    def mask(aoi: org.apache.spark.sql.DataFrame): Seq[Boolean] =
      Clip.clipToAoi(tiles, aoi).select("pixels").head
        .getSeq[Any](0).map(_ != null)

    val repaired = mask(Clip.validateAoi(aoiDf(bowtie)))
    val oracle = mask(aoiDf(manualSplit))
    assert(repaired == oracle)
    val n = repaired.count(identity)
    assert(n > 0 && n < 100) // a real partial clip, not all-in/all-out
  }

  test("validateAoi passes valid geometry through unchanged") {
    val wkt = "POLYGON ((0.5 -9.5, 9.5 -9.5, 9.5 -0.5, 0.5 -0.5, 0.5 -9.5))"
    val out = Clip.validateAoi(
      Seq(RasterModel.Aoi(1L, "A", wkt, 0.5, -9.5, 9.5, -0.5)).toDF())
      .select("geom_wkt").head.getString(0)
    assert(out == wkt)
  }
}
