package graft.stats

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact second-moment (Gram) matrix of a fixed-dimension vector column
  * as ONE typed Aggregator — q163's kernel.
  *
  * Why an Aggregator and not 64 (or 2 016) declarative `sum` columns:
  * the work per row is inherently dim² multiply-adds, which every
  * declarative shape pays too, but a wide decimal aggregate pays for it
  * in GENERATED-CODE SIZE — measured on the bench, the 66-expression
  * row-at-a-time form spends ~3 s per run in janino compilation (the
  * 100-entry codegen cache evicts it between passes of a 185-query
  * sweep), and the full dim²/2-expression form ~12 s in Catalyst
  * analysis alone. This class is ordinary precompiled Scala: nothing to
  * re-analyze, nothing to re-compile, per-row cost is a tight long loop.
  *
  * Exactness: inputs arrive as UNSCALED 1e-7 fixed-point longs (any
  * decimal(12,7) fits: |unscaled| < 1e12). Each pairwise product
  * (< 1e24) and every running sum is accumulated in TWO-LONG 128-bit
  * arithmetic (Math.multiplyHigh + carry), so the result is the exact
  * rational sum regardless of row count or merge order — the associative
  * partial+final contract a distributed aggregate needs, with none of
  * the double-addition order sensitivity that would break the DuckDB
  * oracle hash. `finish` converts to the exact BigDecimal and THEN to
  * double — bit-identical to `sum(decimal)::DOUBLE` in both engines.
  *
  * Buffer layout (Array[Long], primitive encoder, one fixed-width blob
  * per partition into the shuffle): [n, sxHi[dim], sxLo[dim],
  * msHi[dim²], msLo[dim²]] — ms row-major, only j>i cells used.
  */
class MomentAggregator(dim: Int)
    extends Aggregator[Array[Long], Array[Long], MomentAggregator.Moments] {
  private val d2 = dim * dim
  private val sxHiOff = 1
  private val sxLoOff = 1 + dim
  private val msHiOff = 1 + 2 * dim
  private val msLoOff = 1 + 2 * dim + d2

  override def zero: Array[Long] = new Array[Long](1 + 2 * dim + 2 * d2)

  /** 128-bit b[hiIdx/loIdx] += p (p sign-extended to 128 bits). */
  @inline private def add128(b: Array[Long], hiIdx: Int, loIdx: Int,
                             phi: Long, plo: Long): Unit = {
    val lo = b(loIdx)
    val nlo = lo + plo
    // unsigned carry out of the low word
    val carry = ((lo & plo) | ((lo | plo) & ~nlo)) >>> 63
    b(loIdx) = nlo
    b(hiIdx) = b(hiIdx) + phi + carry
  }

  override def reduce(b: Array[Long], v: Array[Long]): Array[Long] = {
    if (v != null && v.length == dim) {
      b(0) += 1
      var i = 0
      while (i < dim) {
        val xi = v(i)
        add128(b, sxHiOff + i, sxLoOff + i, xi >> 63, xi)
        var j = i + 1
        while (j < dim) {
          val xj = v(j)
          val cell = i * dim + j
          add128(b, msHiOff + cell, msLoOff + cell,
            Math.multiplyHigh(xi, xj), xi * xj)
          j += 1
        }
        i += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    a(0) += b(0)
    var i = 0
    while (i < dim) {
      add128(a, sxHiOff + i, sxLoOff + i, b(sxHiOff + i), b(sxLoOff + i))
      i += 1
    }
    var c = 0
    while (c < d2) {
      add128(a, msHiOff + c, msLoOff + c, b(msHiOff + c), b(msLoOff + c))
      c += 1
    }
    a
  }

  /** (hi, lo) two's-complement 128-bit → exact double of value·10^-scale
    * via BigDecimal — the same `sum(decimal)::DOUBLE` both engines run. */
  private def toDouble(hi: Long, lo: Long, scale: Int): Double = {
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    new java.math.BigDecimal(bi, scale).doubleValue
  }

  override def finish(b: Array[Long]): MomentAggregator.Moments = {
    val sx = Array.tabulate(dim)(i =>
      toDouble(b(sxHiOff + i), b(sxLoOff + i), 7))
    val ms = Array.tabulate(d2)(c =>
      toDouble(b(msHiOff + c), b(msLoOff + c), 14))
    MomentAggregator.Moments(b(0), sx, ms)
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[MomentAggregator.Moments] = ExpressionEncoder()
}

object MomentAggregator {
  /** n rows; per-dimension exact sums (as the decimal→double cast) and
    * the row-major upper-triangle product sums (j>i cells; others 0). */
  case class Moments(n: Long, sx: Array[Double], ms: Array[Double])

  /** Column form: moment_matrix(unscaled1e7_longs). */
  def column(dim: Int, v: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(new MomentAggregator(dim), ExpressionEncoder[Array[Long]]()).apply(v)
  }
}
