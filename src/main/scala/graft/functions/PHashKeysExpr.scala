package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The q186 pHash coefficient pipeline as ONE precompiled kernel:
  * 32×32 fixed-point grays (1e-4-unit longs) → 2-D DCT low-frequency
  * block → non-DC-mean threshold bits → four 16-bit LSH band keys —
  * exactly the arithmetic the declarative form spells out as 8 + 64
  * higher-order-function aggregates over decimal(38,0)
  * (StreamQueries q186), reproduced bit-for-bit so the DuckDB oracle
  * hash is unchanged.
  *
  * Why an Expression and not the HOF pipeline: the work per row is
  * identical, but 64 wide decimal HOF aggregates cost ~2.5 s PER RUN in
  * Catalyst analysis + janino codegen (PERF.md round 9 measured the
  * split: execution is ~0.25 s) and the generated class is big enough
  * that the 100-entry codegen cache evicts it between bench passes —
  * the q163 MomentAggregator lesson, second application. This kernel is
  * ordinary precompiled Scala behind a one-call `doGenCode`, so
  * whole-stage codegen stays intact and the per-run planning tax is
  * gone at any scale.
  *
  * Exactness: the row pass (Σ C9·g4, |C9| ≤ 1e9, g4 ≤ 2.55e6) stays
  * within long (≤ 8.5e16); the column pass and the 63·c_i > Σc
  * threshold cross into signed 128-bit (≤ 1.7e29 ≪ 2^127), carried in
  * two-long (hi, lo) arithmetic — [[graft.stats.MomentAggregator]]'s
  * discipline — which equals the decimal(38,0)/HUGEINT arithmetic both
  * engines computed before. Thresholds are strict compares of exact
  * integers, so no rounding mode exists to disagree on. */
case class PHashKeysExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"phash_keys argument must be ARRAY<BIGINT>, got ${t.sql}")
  }

  override protected def nullSafeEval(g4: Any): Any =
    PHashKeysExpr.keys(g4.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g4 => s"graft.functions.PHashKeysExpr.keys($g4)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PHashKeysExpr {

  /** Column face: phash_keys(g4) → array(k0, k1, k2, k3). */
  def of(g4: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.toColumn(
      PHashKeysExpr(org.apache.spark.sql.graftbridge.Bridge.toExpression(g4)))

  /** The kernel (shared by eval and generated code): 1024 grays in,
    * 4 band keys out. */
  def keys(g4: ArrayData): ArrayData = {
    val c9 = graft.ext.Multimodal.dctC9
    // 1-D row pass: r(u)(x) = Σ_y C9(u)(y) · g4(32y + x) — pure long
    val r = Array.ofDim[Long](8, 32)
    var u = 0
    while (u < 8) {
      val cu = c9(u)
      val ru = r(u)
      var x = 0
      while (x < 32) {
        var s = 0L
        var y = 0
        while (y < 32) { s += cu(y) * g4.getLong(y * 32 + x); y += 1 }
        ru(x) = s
        x += 1
      }
      u += 1
    }
    // 1-D column pass, 128-bit exact: cf(8u+v) = Σ_x C9(v)(x) · r(u)(x)
    val cfHi = new Array[Long](64)
    val cfLo = new Array[Long](64)
    u = 0
    while (u < 8) {
      val ru = r(u)
      var v = 0
      while (v < 8) {
        val cv = c9(v)
        var hi = 0L
        var lo = 0L
        var x = 0
        while (x < 32) {
          val a = cv(x)
          val b = ru(x)
          val plo = a * b
          val nlo = lo + plo
          // unsigned carry out of the low word, then the signed high word
          hi += Math.multiplyHigh(a, b) +
            (((lo & plo) | ((lo | plo) & ~nlo)) >>> 63)
          lo = nlo
          x += 1
        }
        cfHi(u * 8 + v) = hi
        cfLo(u * 8 + v) = lo
        v += 1
      }
      u += 1
    }
    // s63 = Σ cf − cf(0), still 128-bit
    var sHi = 0L
    var sLo = 0L
    var i = 0
    while (i < 64) {
      val plo = cfLo(i)
      val nlo = sLo + plo
      sHi += cfHi(i) + (((sLo & plo) | ((sLo | plo) & ~nlo)) >>> 63)
      sLo = nlo
      i += 1
    }
    // subtract cf(0): add its two's-complement negation
    val negLo = -cfLo(0)
    val negHi = ~cfHi(0) + (if (cfLo(0) == 0L) 1L else 0L)
    val nlo0 = sLo + negLo
    sHi += negHi + (((sLo & negLo) | ((sLo | negLo) & ~nlo0)) >>> 63)
    sLo = nlo0
    // threshold bits (63·cf_i > s63, strict, signed-128 compare) folded
    // straight into the four 16-bit band keys
    val ks = new Array[Long](4)
    i = 0
    while (i < 64) {
      val lo63 = cfLo(i) * 63L
      // unsigned high word of lo × 63, then the signed high word of cf·63
      val hi63 = cfHi(i) * 63L +
        Math.multiplyHigh(cfLo(i), 63L) + ((cfLo(i) >> 63) & 63L)
      val gt = hi63 > sHi ||
        (hi63 == sHi && java.lang.Long.compareUnsigned(lo63, sLo) > 0)
      if (gt) ks(i >> 4) |= 1L << (i & 15)
      i += 1
    }
    new GenericArrayData(ks)
  }
}
