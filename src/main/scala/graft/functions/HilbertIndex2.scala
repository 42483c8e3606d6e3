package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert curve index of two `bits`-bit bucket ranks (the classic
  * xy2d rotate-and-accumulate form, e.g. Hamilton TR-2006-610) — the
  * space-filling curve behind [[graft.io.Store.writeZordered]]'s two-key
  * layout. Measured against Morton/Z interleaving on the x51b geometry
  * (CurveAb harness, PLANS.md round 14): Hilbert's no-jump locality cuts
  * files touched per single-column predicate by ~33% and per two-sided
  * predicate by ~47% at 256 files, because a Z curve's discontinuities
  * smear each file's bounding box across the jump while every Hilbert
  * step is unit distance.
  *
  * A straight-line `when()` formulation would duplicate the carried
  * (x, y) state trees ~3x per iteration (3^bits nodes); this expression
  * keeps the loop a loop in both eval and generated code. Null in
  * either rank yields null (callers bucket nulls to rank 0 upstream).
  */
case class HilbertIndex2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert_index needs 1 <= bits <= 31, got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index needs two bigint bucket ranks, got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex2.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  // calls the shared precompiled kernel (same loop the eval path runs) —
  // an inlined copy per generated class re-pays JIT warmup per stage
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertIndex2.compute($a, $b, $bits);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex2 {

  def apply(a: Column, b: Column, bits: Int): Column =
    GraftBridge.toColumn(HilbertIndex2(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b), bits))

  /** Shared by eval and tests; the generated code inlines the same loop. */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1 else 0
      val ry = if ((y & s) > 0L) 1 else 0
      d += s * s * ((3 * rx) ^ ry).toLong
      if (ry == 0) {
        if (rx == 1) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
