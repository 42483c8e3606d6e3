package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All `nTables` random-hyperplane LSH bucket ids of one vector in a single
  * expression: element t of the result is the [[HyperplaneBucket]] value of
  * table t (planes `t*nBits ... t*nBits+nBits-1` of the flat, table-major
  * `planes` matrix).
  *
  * Exists for generated-CODE size, not per-row flops: the LSH index build
  * is `posexplode(array(<table-0 bucket>, ..., <table-15 bucket>))`, and 16
  * separate [[HyperplaneBucket]] nodes inline 16 hashing loops plus 16
  * reference objects into the stage's generated class. At fixture scale
  * that class's one-time cost (janino + interpreted first executions on
  * every core until C2 kicks in) dominates the actual hashing by ~50x —
  * measured 17.8 s CPU cold vs 0.2 s warm for the identical plan at
  * sf0.1. One fused node shrinks the generated source ~16x and reads each
  * vector element once into a local array instead of once per table.
  *
  * Value-identical to the 16-node form: same plane order, same accumulation
  * order, same null contract (null vector -> null; a null ELEMENT -> all
  * `nTables` buckets null, preserving posexplode's row count).
  */
case class HyperplaneBuckets(child: Expression, planes: Array[Array[Double]],
                             nBits: Int)
    extends UnaryExpression {

  // bit i of a 64-bit bucket: plane 64 would silently alias onto bit 0
  require(nBits > 0 && nBits <= 64,
    s"hyperplane_buckets supports 1..64 bits per table, got $nBits")
  require(planes.length % nBits == 0,
    s"planes (${planes.length}) must be a whole number of $nBits-plane tables")

  private def nTables: Int = planes.length / nBits

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hyperplane_buckets needs array<float>, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    HyperplaneBuckets.compute(v.asInstanceOf[ArrayData], planes, nBits)

  // shared precompiled kernel — see SortedIntersectSize.doGenCode for why
  // inlining the loops into every generated class re-pays JIT warmup (the
  // class doc's 17.8 s cold vs 0.2 s warm measurement was exactly this)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HyperplaneBuckets.compute($v, $planesRef, $nBits);")
  }

  // Case-class equality on Array fields is reference equality, which would
  // make two plans over the same plane matrix never canonicalize equal (no
  // subexpression elimination / exchange reuse). Compare by value instead.
  override def equals(other: Any): Boolean = other match {
    case h: HyperplaneBuckets =>
      child == h.child && nBits == h.nBits && java.util.Arrays.deepEquals(
        planes.asInstanceOf[Array[AnyRef]], h.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.deepHashCode(
      planes.asInstanceOf[Array[AnyRef]])) + nBits

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {
  def apply(vec: Column, planes: Seq[Array[Double]], nBits: Int): Column =
    GraftBridge.toColumn(
      HyperplaneBuckets(GraftBridge.toExpression(vec), planes.toArray, nBits))

  /** Shared by eval and generated code. A null ELEMENT yields all-null
    * buckets (preserving posexplode's row count), exactly as before.
    */
  def compute(xs: ArrayData, planes: Array[Array[Double]], nBits: Int): ArrayData = {
    val nTables = planes.length / nBits
    val ne = xs.numElements()
    var d0 = 0
    while (d0 < ne) {
      if (xs.isNullAt(d0)) return new GenericArrayData(new Array[AnyRef](nTables))
      d0 += 1
    }
    val x = new Array[Double](ne)
    var d = 0
    while (d < ne) { x(d) = xs.getFloat(d).toDouble; d += 1 }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var i = 0
      while (i < nBits) {
        val p = planes(t * nBits + i)
        val n = math.min(ne, p.length)
        var acc = 0.0
        var j = 0
        while (j < n) { acc += x(j) * p(j); j += 1 }
        if (acc >= 0) bucket |= (1L << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
