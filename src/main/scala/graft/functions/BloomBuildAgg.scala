package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build aggregate with EXPLICIT geometry — the engine's own
  * replacement for Spark's `BloomFilterAggregate` in the corpus-dedup
  * sketch path ([[graft.ext.Dedup.corpusBloom]]).
  *
  * Why not Spark's: `BloomFilterAggregate` silently clamps its
  * (numItems, numBits) to the runtime-JOIN-filter session confs
  * (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits`,
  * defaults 4M / 67M) — sensible for the optimizer-injected join filters
  * it was built for, wrong for an explicitly-sized corpus sketch, where a
  * 1e9-item request would come back as a saturated 4M-item filter.
  * Round 9 worked around that by temporarily inflating the session confs
  * around the build, which leaked the caps to concurrent queries and
  * raced concurrent builds (restore was last-writer-wins; ADVICE r9 #1).
  * This aggregate takes its geometry as plain constructor values, so the
  * build needs no conf at all and two concurrent builds cannot interact.
  *
  * Semantics match the Spark aggregate over a LongType child exactly
  * (`putLong` per non-null input, `mergeInPlace` across partials, the
  * public `org.apache.spark.util.sketch` codec for both the agg buffers
  * and the final blob), so sketch bytes — and the SketchGoldenSpec pins —
  * are unchanged. Zero input rows yield an EMPTY filter, never null.
  *
  * Scale shape: partial-aggregable by construction (TypedImperativeAgg
  * partials OR-merge up the tree); one bounded blob (numBits/8 bytes)
  * reaches the driver regardless of corpus size.
  */
case class BloomBuildAgg(
    child: Expression,
    numItems: Long,
    numBits: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter]
  with UnaryLike[Expression] {

  require(numItems > 0, s"numItems must be positive, got $numItems")
  require(numBits > 0, s"numBits must be positive, got $numBits")

  // AbstractDataType (and with it ExpectsInputTypes' inputTypes) is
  // private[sql], so the LongType contract is enforced here directly
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_build requires a BIGINT child (a 64-bit hash), got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_build"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(numItems, numBits)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}
