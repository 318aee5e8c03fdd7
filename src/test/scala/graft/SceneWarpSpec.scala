package graft

import graft.model.RasterModel.BandTile
import graft.raster.Resample

/** Seam-correct scene warp: assemble → warp → retile equals warping the
  * whole image directly, and differs from the (seam-blind) per-tile path
  * exactly where destination pixels straddle source tile boundaries. */
class SceneWarpSpec extends SparkSpec {
  import spark.implicits._

  // 2×2 grid of 8×8 tiles with a smooth gradient across the whole scene
  private val ts = 8
  private def mkTile(tc: Int, tr: Int): BandTile = {
    val px = for (r <- 0 until ts; c <- 0 until ts) yield {
      val gx = tc * ts + c; val gy = tr * ts + r
      Some((gx + gy * 0.5f) / 10f)
    }
    BandTile("S", "ndvi", tc, tr, ts, ts, 4326,
      Seq(0.05, 0, 25.0, 0, -0.05, 61.0), Some(-9999.0), px)
  }
  private val tiles = Seq(mkTile(0, 0), mkTile(1, 0), mkTile(0, 1), mkTile(1, 1))

  test("grouped scene warp equals the whole-image warp") {
    val viaGroups = Resample.reprojectScenes(spark, tiles.toDS(), 3857,
        resM = 3000.0, bilinear = true, tileSize = ts)
      .collect().sortBy(t => (t.tile_row, t.tile_col))
    val mosaic = Resample.assembleScene(tiles, ts)
    val whole = Resample.reprojectOne(mosaic, 3857, 3000.0, bilinear = true)
    val reference = Resample.retile(whole, ts).sortBy(t => (t.tile_row, t.tile_col))
    assert(viaGroups.length == reference.length)
    viaGroups.zip(reference).foreach { case (g, r) =>
      assert(g.pixels == r.pixels && g.transform == r.transform,
        s"tile (${g.tile_col},${g.tile_row}) differs")
    }
    assert(viaGroups.map(_.pixels.flatten.size).sum > 0)
  }

  test("mosaic assembly and retiling round trip") {
    val mosaic = Resample.assembleScene(tiles, ts)
    assert(mosaic.width == 16 && mosaic.height == 16)
    // gradient continuity across the seam: value at global (8,0) follows
    // from (7,0) by one gradient step
    val v7 = mosaic.pixels(7).get; val v8 = mosaic.pixels(8).get
    assert(math.abs((v8 - v7) - 0.1f) < 1e-6f)
    val back = Resample.retile(mosaic, ts).sortBy(t => (t.tile_row, t.tile_col))
    assert(back.map(_.pixels) == tiles.sortBy(t => (t.tile_row, t.tile_col)).map(_.pixels))
  }

  test("no-op elision passes tiles through unchanged") {
    val out = Resample.reprojectScenes(spark, tiles.toDS(), 4326, tileSize = ts)
      .collect().sortBy(t => (t.tile_row, t.tile_col))
    assert(out.map(_.pixels).toSeq == tiles.sortBy(t => (t.tile_row, t.tile_col)).map(_.pixels))
  }
}
