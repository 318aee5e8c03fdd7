package graft.raster

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Max-value compositing (MVC) — the classic multi-temporal raster
  * product over the reference's NDVI outputs (Holben '86: per pixel,
  * keep the maximum NDVI across a window of acquisition dates; the
  * standard cloud-suppression composite for Landsat/AVHRR series). The
  * reference computes single-date NDVI scenes
  * (src/transform/compute_ndvi.py); a composite is the first thing a
  * time-series user builds on top of them.
  *
  * Shape: a typed Aggregator whose buffer is THREE fixed-width arrays
  * (running max, winning acquisition day, valid count) — one slot per
  * pixel. Partial aggregation runs map-side, so the shuffle carries one
  * buffer per (cell × input partition), NEVER pixel rows: compositing a
  * year of scenes moves O(cells × tile) through the exchange, not
  * O(scenes × tile). The merge is elementwise max — commutative and
  * associative, so the result is independent of scene arrival order
  * (ties on NDVI resolve to the LATER acquisition day, itself an
  * order-independent rule).
  *
  * Missing observations are NaN in the buffer (NDVI nodata from masked
  * DNs, [[NdviKernel]] N2-N8); a pixel with no valid observation in the
  * whole window finishes as None — same contract as
  * [[graft.stats.NanMeanAggregator]].
  */
/** Aggregation buffer — mx: NaN = no valid observation yet; day: winning
  * acquisition day (days since epoch, -1 = none); n: valid observations
  * per pixel. */
final case class CompositeBuf(mx: Array[Double], day: Array[Int], n: Array[Long])

final case class CompositeOut(mx: Seq[Option[Double]], winDay: Seq[Option[Int]],
                              nValid: Seq[Long])

object CompositeMaxAggregator
    extends Aggregator[(Seq[java.lang.Double], Int), CompositeBuf, CompositeOut] {
  type Buf = CompositeBuf
  type Out = CompositeOut
  private def Buf(mx: Array[Double], day: Array[Int], n: Array[Long]) =
    CompositeBuf(mx, day, n)
  private def Out(mx: Seq[Option[Double]], winDay: Seq[Option[Int]],
                  nValid: Seq[Long]) = CompositeOut(mx, winDay, nValid)

  override def zero: Buf = Buf(Array.empty, Array.empty, Array.empty)

  private def alloc(size: Int): Buf =
    Buf(Array.fill(size)(Double.NaN), Array.fill(size)(-1), new Array[Long](size))

  override def reduce(b0: Buf, in: (Seq[java.lang.Double], Int)): Buf = {
    val (px, day) = in
    val b = if (b0.mx.length == 0) alloc(px.length) else b0
    require(b.mx.length == px.length,
      s"tile size drift: ${b.mx.length} vs ${px.length}")
    var i = 0
    while (i < px.length) {
      val v = px(i)
      if (v != null && !v.isNaN) {
        b.n(i) += 1
        val cur = b.mx(i)
        if (cur.isNaN || v > cur || (v == cur && day > b.day(i))) {
          b.mx(i) = v; b.day(i) = day
        }
      }
      i += 1
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (a.mx.length == 0) return b
    if (b.mx.length == 0) return a
    require(a.mx.length == b.mx.length,
      s"tile size drift: ${a.mx.length} vs ${b.mx.length}")
    var i = 0
    while (i < a.mx.length) {
      a.n(i) += b.n(i)
      val v = b.mx(i)
      if (!v.isNaN) {
        val cur = a.mx(i)
        if (cur.isNaN || v > cur || (v == cur && b.day(i) > a.day(i))) {
          a.mx(i) = v; a.day(i) = b.day(i)
        }
      }
      i += 1
    }
    a
  }

  override def finish(b: Buf): Out = Out(
    b.mx.toSeq.map(v => if (v.isNaN) None else Some(v)),
    b.day.toSeq.map(d => if (d < 0) None else Some(d)),
    b.n.toSeq)

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Out] = ExpressionEncoder()

  /** Column form: composite_max(pixels, day) — pixels one scene's tile
    * (null = nodata), day its acquisition day (days since epoch). */
  def column(pixels: Column, day: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(CompositeMaxAggregator,
      ExpressionEncoder[(Seq[java.lang.Double], Int)]()).apply(pixels, day)
  }
}
