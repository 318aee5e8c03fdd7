package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Ground truth for the perceptual-hash pipeline (no SQL oracle can
  * decode PNG — these assertions are the q174 correctness surface):
  * construction invariants of the hash and exact recall of the banded
  * near-dup join on constructed duplicates. */
class PHashSpec extends SparkSpec {

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  private def hashOf(group: Long, variant: Int): Long =
    Multimodal.pHashOf(Multimodal.syntheticImage(group, variant)).get

  test("constructed 3-pixel variants stay within Hamming 3; cross-group far") {
    val groups = (0L until 40L)
    val dists = groups.map(g => hamming(hashOf(g, 0), hashOf(g, 1)))
    assert(dists.forall(_ <= 3), s"variant dists: $dists")
    val cross = for (g <- 0L until 12L; h <- g + 1 to 12L)
      yield hamming(hashOf(g, 0), hashOf(h, 0))
    assert(cross.forall(_ > 10), s"cross-group min: ${cross.min}")
  }

  test("hash invariant to global brightness shift and contrast scale") {
    // rebuild a texture, then shift/scale every pixel without clamping
    def img(f: Int => Int): java.awt.image.BufferedImage = {
      val base = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.syntheticImage(7L, 0)))
      val out = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = f(base.getRGB(x, y) & 0xff)
        out.setRGB(x, y, v | (v << 8) | (v << 16))
      }
      out
    }
    val h0 = Multimodal.pHash64(Multimodal.grayResample32(img(v => v / 2 + 40)))
    val shifted = Multimodal.pHash64(
      Multimodal.grayResample32(img(v => v / 2 + 80))) // +40 brightness
    val scaled = Multimodal.pHash64(
      Multimodal.grayResample32(img(v => v / 4 + 20))) // 0.5x contrast of h0
    assert(h0 == shifted, "brightness shift must not change the hash")
    assert(hamming(h0, scaled) <= 2, "contrast scale must barely move the hash")
  }

  test("banded near-dup finds exactly the constructed pairs") {
    import spark.implicits._
    val media = (0L until 60L).toDS()
      .mapPartitions(_.map(id => Multimodal.MediaRow(id, "image",
        Multimodal.syntheticImage(id / 2, (id % 2).toInt))))
    val found = Multimodal.pHashNearDup(
        Multimodal.pHashStage(spark, media))
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    val expected = (0L until 30L).map(g => (2 * g, 2 * g + 1)).toSet
    assert(found == expected,
      s"missing: ${expected -- found}, extra: ${found -- expected}")
  }

  test("undecodable payloads are dropped, not hashed") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Multimodal.syntheticImage(1L, 0)),
      Multimodal.MediaRow(2L, "image", "not a png".getBytes)).toDS()
    val ids = Multimodal.pHashStage(spark, media)
      .select("media_id").as[Long].collect().toSeq
    assert(ids == Seq(1L))
  }
}
