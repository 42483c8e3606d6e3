package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** IVF cell assignment: index of the centroid with the largest dot product
  * against the (float) vector. Centroids are expected L2-normalized, so
  * argmax-dot == argmax-cosine. Ties break toward the lower index —
  * deterministic across engines and runs.
  *
  * Same design as [[HyperplaneBucket]]: the centroid matrix rides along as
  * a referenced object; interpreted and generated paths are a tight loop
  * instead of a K x dim expression tree.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nearest_centroid needs array<float>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val r = NearestCentroid.nearest(x, centroids)
    if (r == Integer.MIN_VALUE) null else r
  }

  // shared precompiled kernel — see SortedIntersectSize.doGenCode for why
  // inlining the loops into every generated class re-pays JIT warmup
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |final int $r = graft.functions.NearestCentroid.nearest($v, $cRef);
         |if ($r == Integer.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  // Value equality over the centroid matrix — see the same override in
  // [[HyperplaneBucket]]: reference equality would defeat canonicalization.
  override def equals(other: Any): Boolean = other match {
    case n: NearestCentroid =>
      child == n.child && java.util.Arrays.deepEquals(
        centroids.asInstanceOf[Array[AnyRef]], n.centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftBridge.toColumn(NearestCentroid(GraftBridge.toExpression(vec), centroids))

  /** Shared by eval and generated code; Integer.MIN_VALUE = a null
    * element poisoned the vector (centroid indexes are never negative).
    */
  def nearest(x: ArrayData, centroids: Array[Array[Double]]): Int = {
    val ne = x.numElements()
    var d0 = 0
    while (d0 < ne) {
      if (x.isNullAt(d0)) return Integer.MIN_VALUE
      d0 += 1
    }
    var best = 0
    var bestDot = Double.NegativeInfinity
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      val n = math.min(ne, c.length)
      var acc = 0.0
      var d = 0
      while (d < n) { acc += x.getFloat(d).toDouble * c(d); d += 1 }
      if (acc > bestDot) { bestDot = acc; best = i }
      i += 1
    }
    best
  }
}
