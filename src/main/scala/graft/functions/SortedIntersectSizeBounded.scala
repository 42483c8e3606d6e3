package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** [[SortedIntersectSize]] with a positional early-abort bound — the
  * standard set-similarity-join optimization: a pairwise-Jaccard filter
  * `J >= t` needs the intersection only when it can still reach
  * `required = floor(t * (|A|+|B|) / (1+t))`; during the two-pointer
  * merge, `acc + min(remaining_A, remaining_B)` is a tight upper bound on
  * the final count, and the moment it drops below `required` the pair is
  * provably below threshold — return -1 (a "below threshold" sentinel)
  * instead of finishing the merge. Callers filter `>= 0` before dividing.
  *
  * Safety of the sentinel (why no borderline pair can be lost): the merge
  * returns -1 only when `final_count < required`. For any monotone
  * float rounding of the bound, `floor(float) <= ceil(exact)`, and
  * `J >= t  <=>  count >= ceil(exact bound)` over integer counts — so
  * every aborted pair has J strictly below t, and every surviving pair
  * carries its EXACT count (the abort never fires once the bound holds).
  * Measured effect: most candidate pairs in the length-blocked joins sit
  * far below threshold, and the abort converts their full `|A|+|B|`-step
  * merges into ~`(1-t)`-fraction prefixes (the higher the threshold, the
  * earlier the abort — x3's t=0.9 aborts almost immediately).
  *
  * Same input contract as [[SortedIntersectSize]]: sorted ascending,
  * distinct, no nulls (a null element poisons to NULL).
  */
case class SortedIntersectSizeBounded(first: Expression, second: Expression,
                                      third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "sorted_intersect_size_bounded needs (array<bigint>, array<bigint>, int), got " +
            s"${first.dataType} / ${second.dataType} / ${third.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any, r: Any): Any = {
    val n = SortedIntersectSizeBounded.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], r.asInstanceOf[Int])
    if (n == Integer.MIN_VALUE) null else n
  }

  // calls the shared precompiled kernel — see SortedIntersectSize.doGenCode
  // for why inlining the loop into every generated class re-pays JIT
  // warmup per query
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, r) => {
      val res = ctx.freshName("res")
      s"""
         |final int $res = graft.functions.SortedIntersectSizeBounded.count($a, $b, $r);
         |if ($res == Integer.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedIntersectSizeBounded {

  /** Shared kernel for eval AND generated code. Integer.MIN_VALUE = a
    * null element poisoned the pair; -1 = provably below `required`.
    */
  def count(x: ArrayData, y: ArrayData, required: Int): Int = {
    var i = 0; var j = 0; var n = 0
    val xn = x.numElements(); val yn = y.numElements()
    while (i < xn && j < yn) {
      val remX = xn - i; val remY = yn - j
      if (n + (if (remX < remY) remX else remY) < required) return -1
      if (x.isNullAt(i) || y.isNullAt(j)) return Integer.MIN_VALUE
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    if (n < required) -1 else n
  }

  /** Column-API entry: `required` derived from a Jaccard threshold over
    * the pair's set sizes — `floor(t/(1+t) * (|a|+|b|))`, the largest
    * integer provably not above the exact bound (see class doc).
    */
  def forThreshold(a: Column, b: Column, minJaccard: Double): Column = {
    import org.apache.spark.sql.functions._
    val required = floor(
      lit(minJaccard / (1.0 + minJaccard)) * (size(a) + size(b))).cast("int")
    GraftBridge.toColumn(SortedIntersectSizeBounded(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b),
      GraftBridge.toExpression(required)))
  }
}
