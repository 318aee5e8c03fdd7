package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.stats.MomentAggregator

/** Property tests for the 128-bit fixed-point Gram accumulation — the
  * carry/sign logic is exactly the kind of code a data-range-bounded
  * oracle never stresses, so the reference here is BigDecimal over
  * ADVERSARIAL magnitudes: full decimal(12,7) range (±1e12 unscaled),
  * sign flips, products crossing the long boundary in both directions,
  * and arbitrary merge splits. Pure class test, no Spark session. */
class MomentAggregatorSpec extends AnyFunSuite {

  private def reference(dim: Int, rows: Seq[Array[Long]])
      : (Long, Array[Double], Array[Double]) = {
    val sx = Array.fill(dim)(java.math.BigInteger.ZERO)
    val ms = Array.fill(dim * dim)(java.math.BigInteger.ZERO)
    rows.foreach { v =>
      var i = 0
      while (i < dim) {
        sx(i) = sx(i).add(java.math.BigInteger.valueOf(v(i)))
        var j = i + 1
        while (j < dim) {
          ms(i * dim + j) = ms(i * dim + j).add(
            java.math.BigInteger.valueOf(v(i))
              .multiply(java.math.BigInteger.valueOf(v(j))))
          j += 1
        }
        i += 1
      }
    }
    (rows.size.toLong,
      sx.map(b => new java.math.BigDecimal(b, 7).doubleValue),
      ms.map(b => new java.math.BigDecimal(b, 14).doubleValue))
  }

  private def run(dim: Int, rows: Seq[Array[Long]], splits: Int): Unit = {
    val agg = new MomentAggregator(dim)
    // arbitrary partitioning + merge, as the distributed plan would
    val parts = if (splits <= 1) Seq(rows)
      else rows.grouped(math.max(1, rows.size / splits)).toSeq
    val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .reduceLeftOption(agg.merge).getOrElse(agg.zero)
    val got = agg.finish(merged)
    val (n, sx, ms) = reference(dim, rows)
    assert(got.n == n)
    assert(got.sx.toSeq == sx.toSeq, "element sums must be exact")
    assert(got.ms.toSeq == ms.toSeq, "pair-product sums must be exact")
  }

  test("full decimal(12,7) magnitudes: products beyond long range, exact across merges") {
    val max = 999999999999L // |unscaled| bound of decimal(12,7)
    val rng = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      Array.fill(4)((rng.nextLong() % max) match {
        case v if rng.nextInt(5) == 0 => max * (if (rng.nextBoolean()) 1 else -1)
        case v => v
      })
    }
    (1 to 5).foreach(s => run(4, rows, s))
  }

  test("sign boundaries: alternating extremes whose running sums cross zero repeatedly") {
    val max = 999999999999L
    val rows = (0 until 100).map { k =>
      val sgn = if (k % 2 == 0) 1L else -1L
      Array(sgn * max, -sgn * max, sgn * (max - k), -sgn * 1L)
    }
    (1 to 4).foreach(s => run(4, rows, s))
  }

  test("typical embedding range (|x| < 1): matches the BigDecimal reference") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 500).map(_ => Array.fill(8)(rng.nextInt(20000001) - 10000000L))
    run(8, rows, 3)
  }

  test("empty input and null/short rows are ignored, not miscounted") {
    val agg = new MomentAggregator(4)
    val out = agg.finish(agg.zero)
    assert(out.n == 0 && out.sx.forall(_ == 0.0) && out.ms.forall(_ == 0.0))
    val b = agg.reduce(agg.reduce(agg.zero, null), Array(1L, 2L)) // wrong dim
    assert(agg.finish(b).n == 0)
  }
}
