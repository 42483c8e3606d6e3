package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH bucket id: bit i of the result is the sign of
  * `vec . planes(i)`.
  *
  * The expression-tree formulation (nBits x dim literal multiply-adds —
  * 512 nodes for 8x64) costs seconds of janino compilation per plan and
  * bloats generated code past JIT-friendly sizes. Here the plane matrix
  * rides along as a referenced object and both the interpreted and
  * generated paths are a tight two-level loop.
  */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  // bit i of a 64-bit bucket: plane 64 would silently alias onto bit 0
  // (`1L << 64` wraps) and merge unrelated LSH buckets with no error
  require(planes.length <= 64,
    s"hyperplane_bucket supports at most 64 planes, got ${planes.length}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hyperplane_bucket needs array<float>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (HyperplaneBucket.anyNull(x)) null else HyperplaneBucket.bucketOf(x, planes)
  }

  // shared precompiled kernel — see SortedIntersectSize.doGenCode for why
  // inlining the loops into every generated class re-pays JIT warmup
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |if (graft.functions.HyperplaneBucket.anyNull($v)) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.HyperplaneBucket.bucketOf($v, $planesRef); }
       """.stripMargin
    })
  }

  // Case-class equality on Array fields is reference equality, which would
  // make two plans over the same plane matrix never canonicalize equal (no
  // subexpression elimination / exchange reuse). Compare by value instead.
  override def equals(other: Any): Boolean = other match {
    case h: HyperplaneBucket =>
      child == h.child && java.util.Arrays.deepEquals(
        planes.asInstanceOf[Array[AnyRef]], h.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  def apply(vec: Column, planes: Seq[Array[Double]]): Column =
    GraftBridge.toColumn(HyperplaneBucket(GraftBridge.toExpression(vec), planes.toArray))

  /** Null-element scan (the poison contract). */
  def anyNull(x: ArrayData): Boolean = {
    val ne = x.numElements()
    var i = 0
    while (i < ne) {
      if (x.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Shared by eval and generated code; caller guarantees no null slots. */
  def bucketOf(x: ArrayData, planes: Array[Array[Double]]): Long = {
    val ne = x.numElements()
    var bucket = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      val n = math.min(ne, p.length)
      var acc = 0.0
      var d = 0
      while (d < n) { acc += x.getFloat(d).toDouble * p(d); d += 1 }
      if (acc >= 0) bucket |= (1L << i)
      i += 1
    }
    bucket
  }
}
