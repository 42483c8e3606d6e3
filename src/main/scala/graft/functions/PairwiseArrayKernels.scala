package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of positions where two `array<bigint>` columns hold EQUAL,
  * non-null values — value-identical to
  * `size(filter(zip_with(a, b, (x,y) => x === y), p => p))` (zip_with
  * pads the shorter side with nulls; `null === v` is null, and `filter`
  * drops nulls — so only the common prefix can contribute, exactly this
  * loop). Replaces that interpreted per-pair lambda chain in the MinHash
  * signature-agreement estimate (one call per candidate pair). Never
  * null. Kernel is a shared precompiled static (see
  * [[SortedIntersectSize]] for why generated code calls it instead of
  * inlining).
  */
case class ArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"array_eq_count needs two array<bigint> args, got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayEqCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArrayEqCount.count($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayEqCount {
  def apply(a: Column, b: Column): Column =
    GraftBridge.toColumn(ArrayEqCount(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  def count(x: ArrayData, y: ArrayData): Int = {
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var c = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

/** Total Hamming distance between two equal-length `array<bigint>`
  * columns — value-identical to
  * `aggregate(zip_with(a, b, (x,y) => bit_count(x ^ y)), 0L, +)`:
  * length mismatch or a null element nulls the sum (zip_with pads with
  * nulls and the aggregate's `+` propagates them), spelled here as the
  * Integer.MIN_VALUE sentinel (real distances are never negative).
  * Replaces the interpreted per-pair lambda chain in the SimHash verify
  * join.
  */
case class HammingCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hamming_count needs two array<bigint> args, got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = HammingCount.distance(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |final long $r = graft.functions.HammingCount.distance($a, $b);
         |if ($r == Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingCount {
  def apply(a: Column, b: Column): Column =
    GraftBridge.toColumn(HammingCount(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** Long.MinValue = null (length mismatch or a null element). */
  def distance(x: ArrayData, y: ArrayData): Long = {
    val xn = x.numElements(); val yn = y.numElements()
    if (xn != yn) return Long.MinValue
    var i = 0; var acc = 0L
    while (i < xn) {
      if (x.isNullAt(i) || y.isNullAt(i)) return Long.MinValue
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)).toLong
      i += 1
    }
    acc
  }
}
