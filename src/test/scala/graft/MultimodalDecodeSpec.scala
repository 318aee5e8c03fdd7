package graft

import java.io.ByteArrayOutputStream
import java.awt.image.BufferedImage

import graft.ext.Multimodal

/** Real-codec decode path: payloads generated through the JDK's own
  * encoders (ImageIO / AudioSystem) must decode to their true shape, and
  * opaque payloads must land on the deterministic fallback. */
class MultimodalDecodeSpec extends SparkSpec {

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out), "JDK PNG writer missing")
    out.toByteArray
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out), "JDK JPEG writer missing")
    out.toByteArray
  }

  private def wavBytes(nFrames: Int, sampleRate: Float, channels: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    pcm.indices.foreach(i => pcm(i) = ((i * 13) % 251).toByte)
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("sniffCodec identifies containers by magic bytes") {
    assert(Multimodal.sniffCodec(pngBytes(3, 2)) == "png")
    assert(Multimodal.sniffCodec(jpegBytes(4, 4)) == "jpeg")
    assert(Multimodal.sniffCodec(wavBytes(100, 8000f, 1)) == "wav")
    assert(Multimodal.sniffCodec("plain text".getBytes) == "opaque")
    assert(Multimodal.sniffCodec(Array.empty[Byte]) == "opaque")
  }

  test("PNG and JPEG decode to true dimensions through the JDK codec") {
    val png = Multimodal.decodeMeta(1L, "image", pngBytes(37, 21))
    assert(png.codec == "png" && png.width == 37 && png.height == 21 && png.channels == 3)
    val jpg = Multimodal.decodeMeta(2L, "image", jpegBytes(16, 9))
    assert(jpg.codec == "jpeg" && jpg.width == 16 && jpg.height == 9)
  }

  test("WAV decodes to true frame count, rate, and channels") {
    val m = Multimodal.decodeMeta(3L, "audio", wavBytes(4410, 44100f, 2))
    assert(m.codec == "wav" && m.n_frames == 4410L &&
      m.sample_rate == 44100 && m.channels == 2)
  }

  test("corrupt headers and opaque payloads fall back deterministically") {
    val corrupt = pngBytes(5, 5).take(20) // valid magic, truncated body
    val m = Multimodal.decodeMeta(4L, "image", corrupt)
    assert(m.codec == "opaque") // failed real decode → isolated, not thrown
    val (fw, fh, _) = Multimodal.fakeDecode(corrupt)
    assert(m.width == fw && m.height == fh)
  }

  test("decodeStage uses real dims for decodable payloads in a Spark job") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", pngBytes(37, 21)),
      Multimodal.MediaRow(2L, "audio", wavBytes(100, 8000f, 1)),
      Multimodal.MediaRow(3L, "video", "not media".getBytes)).toDS()
    val rows = Multimodal.decodeStage(spark, media)
      .collect().map(r => r.media_id -> r).toMap
    assert(rows(1L).width == 37 && rows(1L).height == 21)
    // audio: no image dims — decodeMeta reports zeros, real metadata via
    // decodeMetaStage
    assert(rows(2L).width == 0 && rows(2L).height == 0)
    val (fw, fh, _) = Multimodal.fakeDecode("not media".getBytes)
    assert(rows(3L).width == fw && rows(3L).height == fh)
    val metas = Multimodal.decodeMetaStage(spark, media)
      .collect().map(m => m.media_id -> m).toMap
    assert(metas(2L).sample_rate == 8000 && metas(2L).n_frames == 100L)
    assert(metas(1L).codec == "png" && metas(3L).codec == "opaque")
  }

  test("multi-frame GIF: encode -> decode round trip is lossless, ordered, " +
    "and dimension-faithful") {
    // 3 frames of distinct 8x8 gray patterns; the decoded pixels must
    // come back bit-for-bit in frame order (256 grays fit the GIF
    // palette exactly — no quantization loss possible)
    val frames = Seq(
      Array.tabulate(64)(p => p * 4 % 256),
      Array.tabulate(64)(p => 255 - (p * 3 % 256)),
      Array.tabulate(64)(p => (p * p + 7) % 256))
    val payload = Multimodal.encodeGifFrames(frames, 8, 8)
    assert(Multimodal.sniffCodec(payload) == "gif")
    val decoded = Multimodal.decodeFrames(payload)
    assert(decoded.length == 3, "the container walk must find every frame")
    decoded.zip(frames).zipWithIndex.foreach { case (((i, w, h, px), want), k) =>
      assert(i == k && w == 8 && h == 8)
      assert(px.toSeq == want.toSeq, s"frame $k pixels must round-trip exactly")
    }
    // invariance: re-encoding the decoded frames yields identical
    // decoded content again (the codec is a fixed point on its range)
    val re = Multimodal.decodeFrames(Multimodal.encodeGifFrames(
      decoded.map(_._4), 8, 8))
    assert(re.map(_._4.toSeq) == decoded.map(_._4.toSeq))
    // corrupt payloads return empty, never throw (K7 row isolation)
    assert(Multimodal.decodeFrames("not a gif".getBytes).isEmpty)
    assert(Multimodal.decodeFrames(payload.take(20)).isEmpty)
  }

  test("frameStage samples every k-th REAL frame with pixel checksums") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(7L, "video", Multimodal.syntheticVideo(7L, 5)),
      Multimodal.MediaRow(9L, "video", Multimodal.syntheticVideo(9L, 2))).toDS()
    val rows = Multimodal.frameStage(spark, media, everyK = 2).collect()
    val by = rows.map(r => (r.media_id, r.frame_idx) -> r).toMap
    assert(by.keySet == Set((7L, 0L), (7L, 2L), (7L, 4L), (9L, 0L)),
      "every 2nd frame of each container, from its REAL frame count")
    assert(rows.forall(r => r.width == 8 && r.height == 8))
    assert(by((7L, 0L)).n_frames == 5L && by((9L, 0L)).n_frames == 2L)
    // the checksum is over DECODED pixels and must equal the synthetic
    // closed form (m*131 + f*31 + p*7) % 256 folded — the same identity
    // the q83 oracle recomputes in SQL
    def expect(m: Long, f: Long): Long =
      Multimodal.pixelFold(Array.tabulate(64)(p =>
        ((m * 131 + f * 31 + p * 7) % 256).toInt))
    assert(by((7L, 2L)).checksum == expect(7L, 2L))
    assert(by((9L, 0L)).checksum == expect(9L, 0L))
  }
}
