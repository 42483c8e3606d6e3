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
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += ((long) $a.getByte($i)) * ((long) $b.getByte($i));
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftBridge.toColumn(Int8DotProduct(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
