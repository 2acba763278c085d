package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._

/**
 * Hilbert curve index — the space-filling-curve upgrade over Morton/Z-order for
 * multi-dimensional layout: the Hilbert curve preserves locality strictly better
 * (consecutive indices are ALWAYS grid-adjacent; Morton has 2^k-sized jumps), which
 * tightens per-file bounding boxes and improves min/max skipping — the reason
 * Delta Lake added OPTIMIZE ... HILBERT alongside ZORDER.
 *
 * The xy→d mapping is the classic iterative quadrant-rotation algorithm (Hilbert
 * 1891; the bit-twiddling formulation popularized by Warren, "Hacker's Delight"
 * §16): per level s = 2^(bits−1)..1, accumulate the quadrant offset s²·((3·rx)⊕ry)
 * and rotate/reflect the frame. Pure integer arithmetic — bit-identical in any
 * engine, replayed by the oracle as an unrolled SQL CTE chain.
 */
object HilbertCurve {
  /** Hilbert distance of (x, y) on a 2^bits × 2^bits grid. Inputs are masked into
    * range. Exact integer loop — the single code path both eval and codegen use. */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1); var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate: ry==0 → (flip if rx==1) then swap
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

object LayoutExpressions {
  /** `hilbert_index(x, y)` → LONG Hilbert distance on the 2^bits grid. Codegen
    * emits one static call — whole-stage friendly, no expression-tree unrolling. */
  case class HilbertIndex(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_index needs (LONG, LONG), got (${left.dataType}, ${right.dataType})")
    override protected def nullSafeEval(a: Any, b: Any): Any =
      HilbertCurve.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"${ev.value} = graft.functions.HilbertCurve.xy2d($bits, $x, $y);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
}

object LayoutFunctions {
  /** Column wrapper: Hilbert distance of two non-negative int columns on the
    * 2^bits square grid. */
  def hilbertIndex(x: Column, y: Column, bits: Int = 8): Column =
    column(LayoutExpressions.HilbertIndex(
      expression(x.cast("long")), expression(y.cast("long")), bits))
}
