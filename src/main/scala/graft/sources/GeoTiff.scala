package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.RasterModel.{BandTile, TileSize}

/** S3: pure-JVM reader (and test-fixture writer) for the tiled-GeoTIFF
  * subset the reference ingests (reference src/transform/compute_ndvi.py:38-44
  * reads Landsat band rasters with rasterio; the download stage validates
  * content-type tiff/geotiff). Scope — the Landsat SR band shape plus the
  * common derived-product variants: single-band uint16 or float32
  * (BitsPerSample 16/32, SampleFormat unsigned/IEEE), tiled OR
  * strip-organized, Compression none(1), LZW(5, TIFF early-change
  * variant) or deflate(8), horizontal predictor(2) on uint16, both byte
  * orders, GeoTIFF ModelPixelScale + ModelTiepoint georeferencing, EPSG
  * from the GeoKey directory, GDAL_NODATA ascii tag.
  *
  * Output is the engine's `band_tiles` model: one BandTile row per TIFF
  * tile (edge tiles clipped to the image bounds), raw DN values kept —
  * nodata masking stays in the NDVI kernel (N3), exactly as with parquet
  * tile tables.
  *
  * Scale posture: one file = one work unit via the binaryFile source;
  * parallelism is ACROSS scene files (a Landsat band is tens of MB —
  * bounded), and the emitted tile table is the partition-prunable flat
  * model everything downstream uses. No native libs, zero dependencies
  * beyond java.util.zip.
  */
object GeoTiff {

  // TIFF tag ids (TIFF 6.0 + GeoTIFF + GDAL)
  private val TImageWidth = 256
  private val TImageLength = 257
  private val TBitsPerSample = 258
  private val TCompression = 259
  private val TPhotometric = 262
  private val TStripOffsets = 273
  private val TSamplesPerPixel = 277
  private val TRowsPerStrip = 278
  private val TStripByteCounts = 279
  private val TPredictor = 317
  private val TTileWidth = 322
  private val TTileLength = 323
  private val TTileOffsets = 324
  private val TTileByteCounts = 325
  private val TSampleFormat = 339
  private val TModelPixelScale = 33550
  private val TModelTiepoint = 33922
  private val TGeoKeyDirectory = 34735
  private val TGdalNodata = 42113

  // GeoKey ids
  private val KGeographicType = 2048
  private val KProjectedCSType = 3072

  final case class Info(
      width: Int, height: Int, tileW: Int, tileH: Int,
      compression: Int, bitsPerSample: Int, sampleFormat: Int,
      epsg: Int, transform: Seq[Double], nodata: Option[Double],
      tileOffsets: IndexedSeq[Long], tileByteCounts: IndexedSeq[Long],
      stripLayout: Boolean = false, predictor: Int = 1)

  // ---- reader --------------------------------------------------------------

  private final class Ifd(bytes: Array[Byte]) {
    val bb: ByteBuffer = ByteBuffer.wrap(bytes)
    bb.order(bytes(0) match {
      case 'I' => ByteOrder.LITTLE_ENDIAN
      case 'M' => ByteOrder.BIG_ENDIAN
      case b => throw new IllegalArgumentException(s"Not a TIFF (byte-order mark $b)")
    })
    require(bb.getShort(2) == 42, "Not a TIFF (bad magic)")
    private val ifdOff = bb.getInt(4)
    private val nEntries = bb.getShort(ifdOff) & 0xffff
    // tag -> (type, count, valueFieldPos)
    private val entries: Map[Int, (Int, Int, Int)] =
      (0 until nEntries).map { i =>
        val pos = ifdOff + 2 + i * 12
        val tag = bb.getShort(pos) & 0xffff
        val typ = bb.getShort(pos + 2) & 0xffff
        val count = bb.getInt(pos + 4)
        tag -> ((typ, count, pos + 8))
      }.toMap

    private def typeSize(typ: Int): Int = typ match {
      case 1 | 2 => 1 // BYTE, ASCII
      case 3 => 2     // SHORT
      case 4 => 4     // LONG
      case 12 => 8    // DOUBLE
      case t => throw new IllegalArgumentException(s"Unsupported TIFF type $t")
    }

    /** Where the value bytes live: inline when they fit in 4 bytes. */
    private def valuePos(typ: Int, count: Int, field: Int): Int =
      if (typeSize(typ) * count <= 4) field else bb.getInt(field)

    def has(tag: Int): Boolean = entries.contains(tag)

    def longs(tag: Int): IndexedSeq[Long] = {
      val (typ, count, field) = entries(tag)
      val pos = valuePos(typ, count, field)
      (0 until count).map { i =>
        typ match {
          case 3 => (bb.getShort(pos + 2 * i) & 0xffff).toLong
          case 4 => bb.getInt(pos + 4 * i).toLong & 0xffffffffL
          case t => throw new IllegalArgumentException(s"Tag $tag: expected int type, got $t")
        }
      }
    }

    def doubles(tag: Int): IndexedSeq[Double] = {
      val (typ, count, field) = entries(tag)
      require(typ == 12, s"Tag $tag: expected DOUBLE")
      val pos = valuePos(typ, count, field)
      (0 until count).map(i => bb.getDouble(pos + 8 * i))
    }

    def ascii(tag: Int): String = {
      val (typ, count, field) = entries(tag)
      require(typ == 2, s"Tag $tag: expected ASCII")
      val pos = valuePos(typ, count, field)
      val raw = new Array[Byte](count)
      var i = 0
      while (i < count) { raw(i) = bb.get(pos + i); i += 1 }
      new String(raw, "US-ASCII").takeWhile(_ != '\u0000')
    }

    def long1(tag: Int, default: => Long): Long =
      if (has(tag)) longs(tag).head else default
  }

  def readInfo(bytes: Array[Byte]): Info = {
    val ifd = new Ifd(bytes)
    val width = ifd.longs(TImageWidth).head.toInt
    val height = ifd.longs(TImageLength).head.toInt
    val tiled = ifd.has(TTileWidth) && ifd.has(TTileOffsets)
    require(tiled || ifd.has(TStripOffsets),
      "Not a tiled or stripped TIFF (no TileOffsets/StripOffsets)")
    val bps = ifd.long1(TBitsPerSample, 1L).toInt
    val fmt = ifd.long1(TSampleFormat, 1L).toInt
    require((bps == 16 && fmt == 1) || (bps == 32 && fmt == 3),
      s"Only uint16 or float32 samples supported, got $bps-bit format $fmt")
    val spp = ifd.long1(TSamplesPerPixel, 1L).toInt
    require(spp == 1, s"Only single-band TIFFs supported, got $spp samples/pixel")
    val comp = ifd.long1(TCompression, 1L).toInt
    require(comp == 1 || comp == 5 || comp == 8,
      s"Only none/lzw/deflate compression supported, got $comp")
    val predictor = ifd.long1(TPredictor, 1L).toInt
    require(predictor == 1 || (predictor == 2 && bps == 16),
      s"Only predictor none (or horizontal on uint16) supported, got $predictor")
    // georeferencing: pixel scale + tiepoint → north-up affine
    val Seq(sx, sy) = ifd.doubles(TModelPixelScale).take(2).toSeq
    val tp = ifd.doubles(TModelTiepoint)
    val (ti, tj, tx, ty) = (tp(0), tp(1), tp(3), tp(4))
    val transform = Seq(sx, 0.0, tx - ti * sx, 0.0, -sy, ty + tj * sy)
    // EPSG from the GeoKey directory (projected key wins over geographic)
    val keys = if (ifd.has(TGeoKeyDirectory)) ifd.longs(TGeoKeyDirectory) else IndexedSeq.empty
    def geoKey(id: Int): Option[Int] = keys.drop(4).grouped(4).collectFirst {
      case k if k.length == 4 && k(0) == id && k(1) == 0L => k(3).toInt
    }
    val epsg = geoKey(KProjectedCSType).orElse(geoKey(KGeographicType)).getOrElse(0)
    val nodata =
      if (ifd.has(TGdalNodata)) ifd.ascii(TGdalNodata).trim.toDoubleOption else None
    if (tiled)
      Info(width, height,
        ifd.longs(TTileWidth).head.toInt, ifd.longs(TTileLength).head.toInt,
        comp, bps, fmt, epsg, transform, nodata,
        ifd.longs(TTileOffsets), ifd.longs(TTileByteCounts),
        stripLayout = false, predictor = predictor)
    else {
      // strip layout: one "tile" per strip, full image width, no row padding
      val rps = ifd.long1(TRowsPerStrip, height.toLong).toInt
      Info(width, height, width, rps,
        comp, bps, fmt, epsg, transform, nodata,
        ifd.longs(TStripOffsets), ifd.longs(TStripByteCounts),
        stripLayout = true, predictor = predictor)
    }
  }

  // ---- TIFF-variant LZW codec (MSB-first bit packing, early change) --------

  private val LzwClear = 256
  private val LzwEoi = 257

  /** Decode TIFF LZW: 9→12-bit codes, MSB-first, ClearCode 256, EOI 257,
    * "early change" (code width grows when the NEXT table slot is
    * (1<<width)-1 — one entry earlier than plain LZW; TIFF 6.0 §13). */
  private[graft] def lzwDecode(data: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var outOff = 0
    val table = new Array[Array[Byte]](4096)
    var i = 0
    while (i < 256) { table(i) = Array(i.toByte); i += 1 }
    var next = 258
    var width = 9
    var old = -1
    var acc = 0L; var nBits = 0; var pos = 0
    def read(): Int = {
      while (nBits < width && pos < data.length) {
        acc = (acc << 8) | (data(pos) & 0xffL); pos += 1; nBits += 8
      }
      if (nBits < width) LzwEoi
      else { nBits -= width; ((acc >>> nBits) & ((1L << width) - 1)).toInt }
    }
    var code = read()
    while (code != LzwEoi && outOff < outLen) {
      if (code == LzwClear) {
        next = 258; width = 9; old = -1
      } else {
        val entry =
          if (old < 0) table(code)
          else if (code < next && table(code) != null) table(code)
          else table(old) :+ table(old)(0) // KwKwK case
        System.arraycopy(entry, 0, out, outOff, math.min(entry.length, outLen - outOff))
        outOff += entry.length
        if (old >= 0 && next < 4096) {
          table(next) = table(old) :+ entry(0)
          next += 1
          // early change, decoder side: the decoder's table lags the
          // encoder's by one entry, so it widens at (1<<w)-2 where the
          // encoder widens at (1<<w)-1 (TIFF 6.0 §13: 511/1023/2047)
          if (next == (1 << width) - 2 && width < 12) width += 1
        }
        old = code
      }
      code = read()
    }
    require(outOff >= outLen, s"Truncated LZW segment: $outOff of $outLen bytes")
    out
  }

  /** Encode TIFF LZW (fixture writer + sink parity; same early-change rule
    * as [[lzwDecode]]). */
  private[graft] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0
    var width = 9
    def write(code: Int): Unit = {
      acc = (acc << width) | code; nBits += width
      while (nBits >= 8) { nBits -= 8; out.write(((acc >>> nBits) & 0xff).toInt) }
    }
    val dict = new java.util.HashMap[Int, Int]() // (prefix<<8 | byte) -> code
    var next = 258
    def reset(): Unit = { dict.clear(); next = 258; width = 9 }
    write(LzwClear)
    var omega = -1
    var i = 0
    while (i < data.length) {
      val k = data(i) & 0xff
      if (omega < 0) omega = k
      else {
        val key = (omega << 8) | k
        val hit = dict.getOrDefault(key, -1)
        if (hit >= 0) omega = hit
        else {
          write(omega)
          dict.put(key, next); next += 1
          if (next == (1 << width) - 1 && width < 12) width += 1
          omega = k
          if (next >= 4094) { write(LzwClear); reset() }
        }
      }
      i += 1
    }
    if (omega >= 0) write(omega)
    write(LzwEoi)
    if (nBits > 0) out.write(((acc << (8 - nBits)) & 0xff).toInt)
    out.toByteArray
  }

  /** Undo TIFF horizontal differencing (predictor 2) in place, 16-bit
    * samples, row stride `stride` samples. */
  private def undiffRows16(raw: Array[Byte], order: ByteOrder, stride: Int): Unit = {
    val bb = ByteBuffer.wrap(raw).order(order)
    val nRows = raw.length / (stride * 2)
    var r = 0
    while (r < nRows) {
      var c = 1
      while (c < stride) {
        val p = (r * stride + c) * 2
        bb.putShort(p, ((bb.getShort(p) + bb.getShort(p - 2)) & 0xffff).toShort)
        c += 1
      }
      r += 1
    }
  }

  /** Apply TIFF horizontal differencing (predictor 2), 16-bit samples. */
  private def diffRows16(raw: Array[Byte], order: ByteOrder, stride: Int): Unit = {
    val bb = ByteBuffer.wrap(raw).order(order)
    val nRows = raw.length / (stride * 2)
    var r = 0
    while (r < nRows) {
      var c = stride - 1
      while (c >= 1) {
        val p = (r * stride + c) * 2
        bb.putShort(p, ((bb.getShort(p) - bb.getShort(p - 2)) & 0xffff).toShort)
        c -= 1
      }
      r += 1
    }
  }

  private def inflate(data: Array[Byte], outLen: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](outLen)
    var off = 0
    while (off < outLen && !inf.finished()) {
      val n = inf.inflate(out, off, outLen - off)
      if (n == 0 && inf.needsInput())
        throw new IllegalArgumentException("Truncated deflate tile")
      off += n
    }
    inf.end()
    out
  }

  /** Decode one TIFF into BandTile rows (one per interior tile, edge tiles
    * clipped). Raw DN values kept as floats; `nodata` recorded, not masked. */
  def toBandTiles(sceneId: String, band: String, bytes: Array[Byte]): Seq[BandTile] = {
    val info = readInfo(bytes)
    val order =
      if (bytes(0) == 'I') ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val bytesPerSample = info.bitsPerSample / 8
    val tilesAcross = (info.width + info.tileW - 1) / info.tileW
    val tilesDown = (info.height + info.tileH - 1) / info.tileH
    (0 until tilesDown).flatMap { tr =>
      (0 until tilesAcross).map { tc =>
        val ti = tr * tilesAcross + tc
        val w = math.min(info.tileW, info.width - tc * info.tileW)
        val h = math.min(info.tileH, info.height - tr * info.tileH)
        // tile rows are padded to tileW; strip rows are exactly the image
        // width and the LAST strip is short — stride and length differ
        val stride = if (info.stripLayout) info.width else info.tileW
        val rawLen =
          (if (info.stripLayout) stride * h else info.tileW * info.tileH) * bytesPerSample
        val payload = java.util.Arrays.copyOfRange(bytes,
          info.tileOffsets(ti).toInt,
          (info.tileOffsets(ti) + info.tileByteCounts(ti)).toInt)
        val raw = info.compression match {
          case 8 => inflate(payload, rawLen)
          case 5 => lzwDecode(payload, rawLen)
          case _ => payload
        }
        if (info.predictor == 2) undiffRows16(raw, order, stride)
        val tb = ByteBuffer.wrap(raw).order(order)
        val px = new Array[Option[Float]](w * h)
        var r = 0
        while (r < h) {
          var c = 0
          while (c < w) {
            val p = (r * stride + c) * bytesPerSample
            px(r * w + c) = Some(
              if (bytesPerSample == 2) (tb.getShort(p) & 0xffff).toFloat
              else tb.getFloat(p))
            c += 1
          }
          r += 1
        }
        BandTile(sceneId, band, tc, tr, w, h, info.epsg, info.transform,
          info.nodata, px.toSeq)
      }
    }
  }

  /** Directory of `<scene_id>_<band>.tif` files → band_tiles Dataset, via
    * the binaryFile source: one file per input row, decoded in parallel
    * across files (mapPartitions-style typed flatMap; justified — TIFF
    * decode is genuinely imperative byte work). */
  def bandTiles(spark: SparkSession, dir: String): Dataset[BandTile] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tif")
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val stem = path.substring(path.lastIndexOf('/') + 1)
          .stripSuffix(".tif")
        val cut = stem.lastIndexOf('_')
        val (scene, band) =
          if (cut < 0) (stem, "b1") else (stem.take(cut), stem.drop(cut + 1))
        toBandTiles(scene, band, content)
      }
  }

  // ---- writer (synthetic fixtures + sink parity) ---------------------------

  /** Write a single-band tiled uint16 GeoTIFF (little-endian). `data` is
    * row-major width×height unsigned 16-bit values. */
  def write(data: Array[Int], width: Int, height: Int,
            epsg: Int, transform: Seq[Double],
            nodata: Option[Double] = None,
            tileSize: Int = TileSize, deflate: Boolean = false): Array[Byte] =
    writeRaster(Left(data), width, height, epsg, transform, nodata,
      tileSize = tileSize, rowsPerStrip = 0,
      compression = if (deflate) 8 else 1, predictor = 1)

  /** Write a strip-organized single-band uint16 GeoTIFF. */
  def writeStrips(data: Array[Int], width: Int, height: Int,
                  epsg: Int, transform: Seq[Double],
                  nodata: Option[Double] = None,
                  rowsPerStrip: Int = 64, compression: Int = 1,
                  predictor: Int = 1): Array[Byte] =
    writeRaster(Left(data), width, height, epsg, transform, nodata,
      tileSize = 0, rowsPerStrip = rowsPerStrip,
      compression = compression, predictor = predictor)

  /** Write a tiled single-band float32 GeoTIFF (SampleFormat 3). */
  def writeFloat32(data: Array[Float], width: Int, height: Int,
                   epsg: Int, transform: Seq[Double],
                   nodata: Option[Double] = None,
                   tileSize: Int = TileSize, deflate: Boolean = false): Array[Byte] =
    writeRaster(Right(data), width, height, epsg, transform, nodata,
      tileSize = tileSize, rowsPerStrip = 0,
      compression = if (deflate) 8 else 1, predictor = 1)

  /** Write a tiled uint16 GeoTIFF with an explicit compression code
    * (1 none / 5 lzw / 8 deflate) and predictor (1 none / 2 horizontal). */
  def writeTiled(data: Array[Int], width: Int, height: Int,
                 epsg: Int, transform: Seq[Double],
                 nodata: Option[Double] = None,
                 tileSize: Int = TileSize, compression: Int = 1,
                 predictor: Int = 1): Array[Byte] =
    writeRaster(Left(data), width, height, epsg, transform, nodata,
      tileSize = tileSize, rowsPerStrip = 0,
      compression = compression, predictor = predictor)

  /** Core writer: `samples` is uint16 (Left) or float32 (Right);
    * `tileSize` > 0 selects the tiled layout, otherwise `rowsPerStrip`
    * strips. Compression 1/5/8; predictor 2 only for uint16. */
  private def writeRaster(samples: Either[Array[Int], Array[Float]],
                          width: Int, height: Int,
                          epsg: Int, transform: Seq[Double],
                          nodata: Option[Double],
                          tileSize: Int, rowsPerStrip: Int,
                          compression: Int, predictor: Int): Array[Byte] = {
    val nPix = samples.fold(_.length, _.length)
    require(nPix == width * height, "data length != width*height")
    require(compression == 1 || compression == 5 || compression == 8,
      s"unsupported compression $compression")
    require(predictor == 1 || (predictor == 2 && samples.isLeft),
      "predictor 2 requires uint16 samples")
    val Seq(a, _, c, _, e, f) = transform
    require(a > 0 && e < 0, "writer expects a north-up transform")
    val tiled = tileSize > 0
    val bytesPerSample = if (samples.isLeft) 2 else 4
    val tilesAcross = if (tiled) (width + tileSize - 1) / tileSize else 1
    val tilesDown =
      if (tiled) (height + tileSize - 1) / tileSize
      else (height + rowsPerStrip - 1) / rowsPerStrip
    // encode segment payloads (tile rows padded to tileSize, pad value 0;
    // strip rows exactly width samples, last strip short)
    val payloads = (0 until tilesDown).flatMap { tr =>
      (0 until tilesAcross).map { tc =>
        val segW = if (tiled) tileSize else width
        val segH =
          if (tiled) tileSize else math.min(rowsPerStrip, height - tr * rowsPerStrip)
        val raw = ByteBuffer.allocate(segW * segH * bytesPerSample)
          .order(ByteOrder.LITTLE_ENDIAN)
        val baseR = tr * (if (tiled) tileSize else rowsPerStrip)
        var r = 0
        while (r < segH) {
          var cc = 0
          while (cc < segW) {
            val gr = baseR + r; val gc = tc * segW + cc
            val in = gr < height && gc < width
            samples match {
              case Left(u16) => raw.putShort(
                (if (in) u16(gr * width + gc) & 0xffff else 0).toShort)
              case Right(f32) => raw.putFloat(
                if (in) f32(gr * width + gc) else 0f)
            }
            cc += 1
          }
          r += 1
        }
        val arr = raw.array()
        if (predictor == 2) diffRows16(arr, ByteOrder.LITTLE_ENDIAN, segW)
        compression match {
          case 1 => arr
          case 5 => lzwEncode(arr)
          case 8 =>
            val d = new Deflater()
            d.setInput(arr); d.finish()
            val buf = new Array[Byte](arr.length + arr.length / 10 + 64)
            val n = d.deflate(buf); d.end()
            require(d.finished(), "deflate buffer too small")
            java.util.Arrays.copyOf(buf, n)
        }
      }
    }
    val tileDataStart = 8L
    val tileOffsets = payloads.scanLeft(tileDataStart)(_ + _.length).dropRight(1)
    val externalStart = tileDataStart + payloads.map(_.length.toLong).sum

    // external value area — appended values that don't fit inline
    val ext = new java.io.ByteArrayOutputStream()
    def extPut(bs: Array[Byte]): Long = { val off = externalStart + ext.size(); ext.write(bs); off }
    def longsBytes(vs: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(v => b.putInt(v.toInt)); b.array()
    }
    def shortsBytes(vs: Seq[Int]): Array[Byte] = {
      val b = ByteBuffer.allocate(2 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(v => b.putShort(v.toShort)); b.array()
    }
    def doublesBytes(vs: Seq[Double]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putDouble); b.array()
    }

    // entry = (tag, type, count, inlineValue | external offset)
    final case class Entry(tag: Int, typ: Int, count: Int, value: Long)
    def intEntry(tag: Int, typ: Int, vs: Seq[Long]): Entry = {
      val sz = (if (typ == 3) 2 else 4) * vs.length
      if (sz <= 4) {
        // pack inline, little-endian field layout
        val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        if (typ == 3) vs.foreach(v => b.putShort(v.toShort)) else vs.foreach(v => b.putInt(v.toInt))
        Entry(tag, typ, vs.length, b.order(ByteOrder.LITTLE_ENDIAN).getInt(0).toLong & 0xffffffffL)
      } else Entry(tag, typ, vs.length,
        extPut(if (typ == 3) shortsBytes(vs.map(_.toInt)) else longsBytes(vs)))
    }
    def doubleEntry(tag: Int, vs: Seq[Double]): Entry =
      Entry(tag, 12, vs.length, extPut(doublesBytes(vs)))
    def asciiEntry(tag: Int, s: String): Entry = {
      val bs = (s + "\u0000").getBytes("US-ASCII")
      if (bs.length <= 4) {
        val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        b.put(java.util.Arrays.copyOf(bs, 4))
        Entry(tag, 2, bs.length, b.getInt(0).toLong & 0xffffffffL)
      } else Entry(tag, 2, bs.length, extPut(bs))
    }

    // GeoKey directory: version 1.1.0, one key (geographic <32768 is still
    // written as ProjectedCSType for projected codes; 4326-style geographic
    // codes use GeographicType)
    val geoKey = if (epsg >= 32600 || epsg == 3857) KProjectedCSType else KGeographicType
    val geoKeys = Seq(1, 1, 0, 1, geoKey, 0, 1, epsg)

    val layoutEntries =
      if (tiled) Seq(
        intEntry(TTileWidth, 3, Seq(tileSize.toLong)),
        intEntry(TTileLength, 3, Seq(tileSize.toLong)),
        intEntry(TTileOffsets, 4, tileOffsets),
        intEntry(TTileByteCounts, 4, payloads.map(_.length.toLong)))
      else Seq(
        intEntry(TRowsPerStrip, 4, Seq(rowsPerStrip.toLong)),
        intEntry(TStripOffsets, 4, tileOffsets),
        intEntry(TStripByteCounts, 4, payloads.map(_.length.toLong)))
    val entries = (Seq(
      intEntry(TImageWidth, 3, Seq(width.toLong)),
      intEntry(TImageLength, 3, Seq(height.toLong)),
      intEntry(TBitsPerSample, 3, Seq(bytesPerSample * 8L)),
      intEntry(TCompression, 3, Seq(compression.toLong)),
      intEntry(TPhotometric, 3, Seq(1L)),
      intEntry(TSamplesPerPixel, 3, Seq(1L)),
      intEntry(TSampleFormat, 3, Seq(if (samples.isLeft) 1L else 3L)),
      doubleEntry(TModelPixelScale, Seq(a, -e, 0.0)),
      doubleEntry(TModelTiepoint, Seq(0.0, 0.0, 0.0, c, f, 0.0)),
      intEntry(TGeoKeyDirectory, 3, geoKeys.map(_.toLong))) ++
      layoutEntries ++
      (if (predictor == 2) Seq(intEntry(TPredictor, 3, Seq(2L))) else Seq.empty) ++
      nodata.map(nd => asciiEntry(TGdalNodata,
        if (nd == nd.toLong.toDouble) nd.toLong.toString else nd.toString)).toSeq
    ).sortBy(_.tag)

    val ifdStart = externalStart + ext.size()
    val total = ifdStart + 2 + entries.length * 12 + 4
    val out = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdStart.toInt)
    payloads.foreach(out.put)
    out.put(ext.toByteArray)
    out.putShort(entries.length.toShort)
    entries.foreach { en =>
      out.putShort(en.tag.toShort).putShort(en.typ.toShort)
        .putInt(en.count).putInt(en.value.toInt)
    }
    out.putInt(0) // no next IFD
    out.array()
  }
}
