package graft.stats

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A1 `_nanmean` as a typed Aggregator (SURVEY.md §7: "custom
  * Aggregator[…] to avoid explode") — the alternative to the fold-based
  * partial in NdviKernel.meanNdviPerScene. Input is one tile's pixel
  * array (null = masked); the buffer is the (sum, count) partial, merged
  * associatively — a textbook partial+final aggregate that enters the
  * shuffle as 16 bytes per tile regardless of tile size. NULL when every
  * pixel in the group is masked (reference load_to_postgis.py:74-79).
  */
object NanMeanAggregator
    extends Aggregator[Seq[java.lang.Float], (Double, Long), Option[Double]] {

  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), pixels: Seq[java.lang.Float]): (Double, Long) = {
    var s = b._1; var c = b._2
    pixels.foreach { p =>
      if (p != null && !p.isNaN && !p.isInfinite) { s += p.toDouble; c += 1 }
    }
    (s, c)
  }

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Double, Long)): Option[Double] =
    if (r._2 > 0) Some(r._1 / r._2) else None

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Option[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  /** Column form for DataFrame use: nan_mean(pixels). */
  def column(pixels: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    udaf(NanMeanAggregator, ExpressionEncoder[Seq[java.lang.Float]]()).apply(pixels)
  }
}
