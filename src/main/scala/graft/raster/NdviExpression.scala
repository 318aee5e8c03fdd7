package graft.raster

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** The NDVI kernel (N2–N8) as a native Catalyst expression — the perf
  * path promised in SURVEY.md §7 step 2.
  *
  * Why: Spark's higher-order functions (zip_with/aggregate) evaluate their
  * lambda interpreted, per element — fine for correctness, slow for 65k
  * pixels per tile. This expression runs one JIT-compiled imperative loop
  * per tile over primitive ArrayData. It is also MORE faithful than the
  * Column chain: the ratio uses true float32 division (NumPy semantics,
  * reference src/transform/compute_ndvi.py:62-65), not Spark's
  * double-divide-then-cast.
  *
  * Null element = masked pixel (N7: -9999 only at the sink boundary).
  */
case class NdviKernelExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {

  require(children.length == 4,
    "NdviKernelExpr(redPx, nirPx, redNodata, nirNodata)")

  override def dataType: DataType = ArrayType(FloatType, containsNull = true)
  override def nullable: Boolean = children.take(2).exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val redAny = children(0).eval(input)
    val nirAny = children(1).eval(input)
    if (redAny == null || nirAny == null) return null
    val red = redAny.asInstanceOf[ArrayData]
    val nir = nirAny.asInstanceOf[ArrayData]
    val rndAny = children(2).eval(input)
    val nndAny = children(3).eval(input)
    val rnd = if (rndAny == null) Float.NaN else rndAny.asInstanceOf[Double].toFloat
    val nnd = if (nndAny == null) Float.NaN else nndAny.asInstanceOf[Double].toFloat
    val nPx = red.numElements()
    val out = new Array[Any](nPx)
    var i = 0
    while (i < nPx) {
      if (red.isNullAt(i) || nir.isNullAt(i)) {
        out(i) = null
      } else {
        val r0 = red.getFloat(i)
        val n0 = nir.getFloat(i)
        // N3: raw-DN mask (fill 0 + declared nodata) BEFORE scaling
        if (r0 == 0f || n0 == 0f || r0 == rnd || n0 == nnd) {
          out(i) = null
        } else {
          // N4: float32 scaling
          val r = r0 * NdviKernel.Scale + NdviKernel.Offset
          val n = n0 * NdviKernel.Scale + NdviKernel.Offset
          // N5: non-finite mask
          if (java.lang.Float.isNaN(r) || java.lang.Float.isInfinite(r) ||
              java.lang.Float.isNaN(n) || java.lang.Float.isInfinite(n)) {
            out(i) = null
          } else {
            // N6: true float32 epsilon-safe division; N8: clamp
            val v = (n - r) / (n + r + NdviKernel.Eps)
            val clamped = if (java.lang.Float.isNaN(v)) v
              else if (v < -1f) -1f else if (v > 1f) 1f else v
            out(i) = if (java.lang.Float.isNaN(clamped) ||
                         java.lang.Float.isInfinite(clamped)) null
                     else java.lang.Float.valueOf(clamped)
          }
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

object NdviKernelExpr {
  /** Column wrapper: ndvi_kernel(redPx, nirPx, redNodata, nirNodata). */
  def apply(redPx: Column, nirPx: Column,
            redNodata: Column, nirNodata: Column): Column =
    Bridge.toColumn(NdviKernelExpr(Seq(
      Bridge.toExpression(redPx), Bridge.toExpression(nirPx),
      Bridge.toExpression(redNodata), Bridge.toExpression(nirNodata))))
}
