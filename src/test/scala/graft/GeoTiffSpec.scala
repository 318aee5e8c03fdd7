package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.GeoTiff
import graft.raster.NdviKernel

/** S3: tiled uint16 GeoTIFF subset reader — encode/decode round trips
  * (uncompressed + deflate, edge-tile clipping, georeferencing tags) and a
  * pipeline run (binaryFile source → band_tiles → NDVI kernel) from a
  * synthetic .tif fixture. */
class GeoTiffSpec extends SparkSpec {
  import spark.implicits._

  // 100×70 image, 64-px tiles → 2×2 tile grid with clipped edges
  private val w = 100; private val h = 70; private val ts = 64
  private def gradient(i: Int): Int = (i * 7) % 60000
  private val data = Array.tabulate(w * h)(gradient)
  private val tf = Seq(30.0, 0.0, 600000.0, 0.0, -30.0, 6700000.0)

  private def roundTrip(deflate: Boolean): Unit = {
    val bytes = GeoTiff.write(data, w, h, 32635, tf, Some(0.0), ts, deflate)
    val info = GeoTiff.readInfo(bytes)
    assert(info.width == w && info.height == h)
    assert(info.tileW == ts && info.tileH == ts)
    assert(info.compression == (if (deflate) 8 else 1))
    assert(info.epsg == 32635)
    assert(info.transform == tf)
    assert(info.nodata.contains(0.0))
    val tiles = GeoTiff.toBandTiles("S", "red", bytes)
    assert(tiles.length == 4) // 2x2 grid
    val byPos = tiles.map(t => (t.tile_col, t.tile_row) -> t).toMap
    assert(byPos((0, 0)).width == 64 && byPos((0, 0)).height == 64)
    assert(byPos((1, 0)).width == 36 && byPos((1, 0)).height == 64) // clipped
    assert(byPos((1, 1)).width == 36 && byPos((1, 1)).height == 6)
    // every pixel round-trips exactly
    tiles.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width) {
        val expect = gradient((t.tile_row * ts + r) * w + (t.tile_col * ts + c)).toFloat
        assert(t.pixels(r * t.width + c).contains(expect),
          s"tile (${t.tile_col},${t.tile_row}) px ($c,$r)")
      }
    }
  }

  test("uncompressed round trip with edge-tile clipping")(roundTrip(deflate = false))
  test("deflate round trip")(roundTrip(deflate = true))

  test("reader rejects non-TIFF and unsupported layouts") {
    intercept[IllegalArgumentException] {
      GeoTiff.readInfo("not a tiff at all".getBytes)
    }
  }

  test("binaryFile source reads a .tif directory into band_tiles and NDVI runs") {
    val dir = Files.createTempDirectory("graft_tif").toString
    // red = 1000 DN, nir = 3000 DN constants → NDVI is exactly computable
    def const(v: Int) = Array.fill(w * h)(v)
    Files.write(Paths.get(s"$dir/SCENE1_red.tif"),
      GeoTiff.write(const(1000), w, h, 32635, tf, Some(0.0), ts))
    Files.write(Paths.get(s"$dir/SCENE1_nir08.tif"),
      GeoTiff.write(const(3000), w, h, 32635, tf, Some(0.0), ts, deflate = true))
    val tiles = GeoTiff.bandTiles(spark, dir)
    val df = tiles.toDF()
    assert(df.count() == 8) // 2 bands × 4 tiles
    assert(df.select("band").distinct().as[String].collect().toSet == Set("red", "nir08"))
    val ndvi = NdviKernel.computeNdvi(
      df.withColumn("band",
        when(col("band") === "nir08", "nir").otherwise(col("band"))))
    val vals = ndvi.select(explode(col("pixels")).as("p"))
      .select(col("p").cast("double")).as[Double].collect()
    assert(vals.length == w * h)
    // reference scaling DN*2.75e-5 - 0.2: red → -0.1725, nir → -0.1175,
    // ndvi = (nir-red)/(nir+red) = 0.055 / -0.29 ≈ -0.18966
    assert(vals.toSet.size == 1)
    val expected = {
      val red = 1000 * 2.75e-5f - 0.2f; val nir = 3000 * 2.75e-5f - 0.2f
      (nir - red) / (nir + red)
    }
    assert(math.abs(vals.head - expected) < 1e-6)
  }
}
