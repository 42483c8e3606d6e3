package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element-wise sum of `array<float>` vectors into one `array<double>` —
  * the aggregation half of distributed (spherical) k-means.
  *
  * Exists so the Lloyd update can shuffle ONE row per cell instead of one
  * row per (cell, position): the previous formulation exploded every
  * corpus vector into `dim` (cell, pos, v) rows and hash-aggregated
  * per-position sums — a `dim`x row inflation before the shuffle and a
  * wide generated hash-agg class whose one-time cost dominated the actual
  * arithmetic at fixture scale. This aggregate keeps vectors whole:
  * per-partition partials are a single double[dim] accumulator, merges are
  * element-wise adds up the tree, and the shuffle carries nCells rows of
  * dim doubles — O(nCells x dim) bytes total, never O(corpus).
  *
  * Null contract: a null INPUT ARRAY is skipped (standard aggregate
  * behavior); a null ELEMENT contributes 0 to its position. Ragged inputs
  * sum position-wise over the positions each vector actually has (the
  * accumulator grows to the longest vector seen). Zero input rows yield an
  * empty array, never null.
  */
case class VectorSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vector_sum requires an array<float> child, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_vector_sum"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val xs = v.asInstanceOf[ArrayData]
    val ne = xs.numElements()
    val acc =
      if (buffer.length >= ne) buffer else java.util.Arrays.copyOf(buffer, ne)
    var d = 0
    while (d < ne) {
      if (!xs.isNullAt(d)) acc(d) += xs.getFloat(d).toDouble
      d += 1
    }
    acc
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    val (big, small) =
      if (buffer.length >= other.length) (buffer, other) else (other, buffer)
    var d = 0
    while (d < small.length) { big(d) += small(d); d += 1 }
    big
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}
