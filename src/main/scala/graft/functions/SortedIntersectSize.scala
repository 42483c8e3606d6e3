package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `|A ∩ B|` for two SORTED long arrays via a two-pointer merge.
  *
  * Built-in `array_intersect` builds a hash set per CALL — measured ~25 µs
  * per pair on 50-element arrays, which dominates pairwise-Jaccard jobs
  * (Dedup.ngramJaccardPairs evaluates it once per candidate pair, ~1M times
  * at bench scale). This expression reads the `ArrayData` longs directly
  * (no boxing, no set allocation) and generates straight-line Java in
  * whole-stage codegen: ~0.1 µs per pair.
  *
  * Inputs MUST be sorted ascending and distinct (use
  * `array_sort(array_distinct(...))` upstream); behavior on unsorted input
  * is an undercount, never an error. A NULL element anywhere makes the
  * result NULL — the hash-derived inputs this serves never contain nulls,
  * and poisoning beats a silent spurious match from a null slot reading
  * as 0.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_size needs two array<bigint> args, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val n = SortedIntersectSize.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (n == Integer.MIN_VALUE) null else n
  }

  // The generated code CALLS the shared precompiled kernel instead of
  // inlining the loop: an inlined copy lives in a fresh generated class
  // per query stage, so every query re-pays interpreter/C1 warmup over
  // its first millions of pairs (measured: ~30 s of task CPU on the
  // first x3-shaped query per JVM, ~2.4 s once hot). A static method is
  // JIT-compiled once per JVM and already hot for every later stage.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |final int $r = graft.functions.SortedIntersectSize.count($a, $b);
         |if ($r == Integer.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.toColumn(SortedIntersectSize(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** Shared kernel for eval AND generated code (Integer.MIN_VALUE = a
    * null element poisoned the pair — the boxed-null contract without a
    * per-pair allocation). Counts fit an int, so the sentinel is safe.
    */
  def count(x: ArrayData, y: ArrayData): Int = {
    var i = 0; var j = 0; var n = 0
    val xn = x.numElements(); val yn = y.numElements()
    while (i < xn && j < yn) {
      if (x.isNullAt(i) || y.isNullAt(j)) return Integer.MIN_VALUE
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }
}
