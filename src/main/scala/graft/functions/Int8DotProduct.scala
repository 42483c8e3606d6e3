package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Integer dot product of two `array<tinyint>` quantization-code columns
  * (the candidate-scoring primitive of the quantized ANN serving path,
  * [[graft.ext.SimSearch.quantizedTopK]]).
  *
  * Accumulates in long: |codes| <= 127, so even a 2^48-element vector
  * cannot overflow — the result is EXACT integer arithmetic, which is what
  * makes the serving score replayable across engines (no float summation
  * order to worry about). Same straight-line codegen shape as
  * [[FloatDotProduct]]; the per-pair cost is a byte-load multiply-add, and
  * the candidate stage only ever touches the 1-byte codes (4x less memory
  * bandwidth than float re-scoring — the point of serving on int8).
  *
  * Lengths must match (it iterates min(len), the truncation `zip_with`
  * would apply on ragged input). A NULL element anywhere makes the result
  * NULL (the zip_with form's poison-the-sum semantics — see
  * [[FloatDotProduct]]).
  */
case class Int8DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"int8_dot_product needs two array<tinyint> args, got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (Int8DotProduct.anyNull(x, y)) null else Int8DotProduct.dot(x, y)
  }

  // shared precompiled kernel — see SortedIntersectSize.doGenCode for why
  // inlining the loop into every generated class re-pays JIT warmup
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if (graft.functions.Int8DotProduct.anyNull($a, $b)) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.Int8DotProduct.dot($a, $b); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8DotProduct {

  /** Null-element scan over the iterated prefix (the old fused loop's
    * poison window).
    */
  def anyNull(x: ArrayData, y: ArrayData): Boolean = {
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Shared by eval and generated code; caller guarantees no null slots. */
  def dot(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    GraftBridge.toColumn(Int8DotProduct(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
