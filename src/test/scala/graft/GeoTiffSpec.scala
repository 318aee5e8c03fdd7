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

  private def assertPixelsMatch(bytes: Array[Byte]): Unit = {
    val tiles = GeoTiff.toBandTiles("S", "red", bytes)
    val ts2 = GeoTiff.readInfo(bytes)
    tiles.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width) {
        val gr = t.tile_row * ts2.tileH + r; val gc = t.tile_col * ts2.tileW + c
        val expect = gradient(gr * w + gc).toFloat
        assert(t.pixels(r * t.width + c).contains(expect),
          s"tile (${t.tile_col},${t.tile_row}) px ($c,$r)")
      }
    }
    assert(tiles.map(t => t.width.toLong * t.height).sum == w.toLong * h)
  }

  test("lzw codec round-trips arbitrary byte streams including table resets") {
    val rnd = new scala.util.Random(7)
    // compressible (runs), incompressible (random), and long enough to
    // force a table reset + code-width growth through 10/11/12 bits
    val cases = Seq(
      Array.fill[Byte](50000)(42),
      Array.tabulate[Byte](60000)(i => (i % 251).toByte),
      Array.fill[Byte](70000)(0).map(_ => rnd.nextInt(256).toByte),
      Array.empty[Byte])
    cases.foreach { in =>
      val enc = GeoTiff.lzwEncode(in)
      val dec = GeoTiff.lzwDecode(enc, in.length)
      assert(java.util.Arrays.equals(dec, in), s"lzw mismatch at len ${in.length}")
    }
  }

  test("strip layout round trip (uncompressed, short last strip)") {
    val bytes = GeoTiff.writeStrips(data, w, h, 32635, tf, Some(0.0), rowsPerStrip = 32)
    val info = GeoTiff.readInfo(bytes)
    assert(info.stripLayout && info.tileH == 32 && info.tileW == w)
    assert(info.tileOffsets.length == 3) // 32+32+6 rows
    assertPixelsMatch(bytes)
  }

  test("strip layout round trip (lzw + horizontal predictor)") {
    val bytes = GeoTiff.writeStrips(data, w, h, 32635, tf, Some(0.0),
      rowsPerStrip = 32, compression = 5, predictor = 2)
    val info = GeoTiff.readInfo(bytes)
    assert(info.stripLayout && info.compression == 5 && info.predictor == 2)
    assertPixelsMatch(bytes)
  }

  test("strip layout round trip (deflate)") {
    val bytes = GeoTiff.writeStrips(data, w, h, 32635, tf, Some(0.0),
      rowsPerStrip = 16, compression = 8)
    assertPixelsMatch(bytes)
  }

  test("tiled lzw round trip (with and without predictor)") {
    assertPixelsMatch(GeoTiff.writeTiled(data, w, h, 32635, tf, Some(0.0), ts,
      compression = 5))
    assertPixelsMatch(GeoTiff.writeTiled(data, w, h, 32635, tf, Some(0.0), ts,
      compression = 5, predictor = 2))
  }

  test("float32 tiled round trip preserves exact sample values") {
    val fdata = Array.tabulate(w * h)(i => (i * 0.125f) - 100f)
    val bytes = GeoTiff.writeFloat32(fdata, w, h, 32635, tf, Some(-9999.0), ts)
    val info = GeoTiff.readInfo(bytes)
    assert(info.bitsPerSample == 32 && info.sampleFormat == 3)
    val tiles = GeoTiff.toBandTiles("S", "red", bytes)
    tiles.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width) {
        val gr = t.tile_row * ts + r; val gc = t.tile_col * ts + c
        assert(t.pixels(r * t.width + c).contains(fdata(gr * w + gc)))
      }
    }
  }

  test("reader rejects unknown compression; writer rejects invalid combos") {
    // hand-corrupt a valid file: locate the IFD entry for a tag and
    // overwrite its inline value field (little-endian layout, IFD offset
    // at byte 4, 12-byte entries starting at ifdOff+2)
    def patchTag(bytes: Array[Byte], tag: Int, newValue: Int): Array[Byte] = {
      val out = bytes.clone()
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ifdOff = bb.getInt(4)
      val n = bb.getShort(ifdOff) & 0xffff
      val pos = (0 until n).map(i => ifdOff + 2 + i * 12)
        .find(p => (bb.getShort(p) & 0xffff) == tag)
        .getOrElse(fail(s"tag $tag not present"))
      bb.putShort(pos + 8, newValue.toShort)
      out
    }
    val good = GeoTiff.writeFloat32(Array.fill(w * h)(1.5f), w, h, 32635, tf, None, ts)
    assert(GeoTiff.readInfo(good).sampleFormat == 3)
    val badComp = patchTag(good, 259, 99) // compression = 99
    val e1 = intercept[IllegalArgumentException](GeoTiff.readInfo(badComp))
    assert(e1.getMessage.contains("compression"))
    // reader guard on unsupported predictors: flip a real predictor tag to 3
    val u16 = GeoTiff.writeTiled(data, w, h, 32635, tf, None, ts,
      compression = 5, predictor = 2)
    val badPred3 = patchTag(u16, 317, 3)
    val e2 = intercept[IllegalArgumentException](GeoTiff.readInfo(badPred3))
    assert(e2.getMessage.contains("predictor"))
    // writer-side guards
    intercept[IllegalArgumentException](
      GeoTiff.writeTiled(data, w, h, 32635, tf, None, ts, compression = 99))
    intercept[IllegalArgumentException](
      GeoTiff.writeStrips(data.take(w * h), w, h, 32635, tf, None,
        rowsPerStrip = 32, compression = 5, predictor = 7))
  }

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

  test("external LZW fixture (independent encoder) decodes exactly") {
    // tools/make_lzw_fixture.py writes this file with a from-scratch
    // Python LZW implementation (TIFF 6.0 §13) — decoding it checks the
    // Scala codec against bytes it did not produce itself. The pixel
    // formula and geo tags below are the generator's documented contract.
    val in = getClass.getResourceAsStream("/graft/external_lzw.tif")
    assert(in != null, "fixture missing: run tools/make_lzw_fixture.py")
    val bytes = try in.readAllBytes() finally in.close()
    val info = GeoTiff.readInfo(bytes)
    assert(info.width == 64 && info.height == 40 && info.compression == 5)
    assert(info.stripLayout && info.tileH == 16)
    assert(info.epsg == 32633)
    assert(info.transform == Seq(30.0, 0.0, 500000.0, 0.0, -30.0, 4000000.0))
    assert(info.nodata.contains(0.0))
    val tiles = GeoTiff.toBandTiles("X", "red", bytes)
    assert(tiles.length == 3)
    val flat = tiles.sortBy(_.tile_row).flatMap(_.pixels)
    assert(flat.length == 64 * 40)
    flat.zipWithIndex.foreach { case (p, i) =>
      val expect = ((i.toLong * i / 7 + 13L * i) % 9973).toFloat
      // value 0 maps to nodata → None; all others must match exactly
      if (expect == 0f) assert(p.isEmpty || p.contains(0f))
      else assert(p.contains(expect), s"pixel $i: $p != $expect")
    }
  }
}
