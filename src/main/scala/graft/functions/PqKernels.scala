package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Product-quantization kernels (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011): a vector
  * is split into `m` contiguous subvectors, each encoded as the index of
  * its nearest sub-centroid out of `ksub` — the whole vector compresses to
  * `m` BYTES (vs 4·dim float), which is what makes an exhaustive
  * compressed scan affordable at 100 TB: the hot loop reads codes + a
  * per-query lookup table and never touches float vectors.
  *
  * Three fused codegen'd expressions (same design rationale as
  * [[HyperplaneBuckets]] — one tight loop and one reference object per
  * kernel instead of an m×ksub expression tree):
  *
  *  - [[PqEncode]]   vector -> `binary` codes (index build, map-only)
  *  - [[PqLut]]      query vector -> flat `m*ksub` distance table (once
  *                   per QUERY, not per pair — the ADC trick)
  *  - [[PqAdcScore]] (lut, codes) -> distance (the per-pair hot loop:
  *                   `m` table lookups, no arithmetic on vectors)
  *
  * All three L2-normalize the input vector first (`||a-b||² = 2−2·cosθ`
  * on unit vectors, so ADC-ascending == cosine-descending — the metric
  * every other ANN tier here ranks by). Shared contracts: null vector or
  * null element -> null; vector length must equal `m · dsub` (else null —
  * a ragged row cannot be coded against the trained codebooks); distances
  * accumulate in doubles in subspace-major order, so results are
  * bit-identical across partition layouts.
  */
object PqKernels {
  /** Flattens [m][ksub][dsub] codebooks and validates shape. */
  private[functions] def shape(codebooks: Array[Array[Array[Double]]]): (Int, Int, Int) = {
    val m = codebooks.length
    require(m > 0, "pq codebooks must have at least one subspace")
    val ksub = codebooks(0).length
    require(ksub > 0 && ksub <= 256, s"pq needs 1..256 centroids per subspace (byte codes), got $ksub")
    val dsub = codebooks(0)(0).length
    require(codebooks.forall(cb => cb.length == ksub && cb.forall(_.length == dsub)),
      s"pq codebooks must be rectangular [m=$m][ksub=$ksub][dsub=$dsub]")
    (m, ksub, dsub)
  }

  // Shared precompiled kernels for eval AND generated code — see
  // SortedIntersectSize.doGenCode for why inlining the loops into every
  // generated class re-pays interpreter/C1 warmup per query stage.
  // Poison contract: a null return (encode/lut) or -1.0 (score — real
  // distances are sums of squares, never negative) maps to SQL NULL.

  /** Unit-normalized copy of the vector, or null on ragged/null-element. */
  private def normalized(xs: ArrayData, dim: Int): Array[Double] = {
    val ne = xs.numElements()
    if (ne != dim) return null
    val x = new Array[Double](ne)
    var d = 0
    while (d < ne) {
      if (xs.isNullAt(d)) return null
      x(d) = xs.getFloat(d).toDouble
      d += 1
    }
    var nrm = 0.0
    d = 0
    while (d < ne) { nrm += x(d) * x(d); d += 1 }
    nrm = math.max(math.sqrt(nrm), 1e-12)
    d = 0
    while (d < ne) { x(d) = x(d) / nrm; d += 1 }
    x
  }

  def encode(xs: ArrayData, codebooks: Array[Array[Array[Double]]],
             m: Int, ksub: Int, dsub: Int): Array[Byte] = {
    val x = normalized(xs, m * dsub)
    if (x == null) return null
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      var best = 0
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val cent = cb(c)
        var acc = 0.0
        var t = 0
        while (t < dsub) {
          val diff = x(j * dsub + t) - cent(t)
          acc += diff * diff
          t += 1
        }
        if (acc < bestDist) { bestDist = acc; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  def lut(xs: ArrayData, codebooks: Array[Array[Array[Double]]],
          m: Int, ksub: Int, dsub: Int): ArrayData = {
    val x = normalized(xs, m * dsub)
    if (x == null) return null
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      var c = 0
      while (c < ksub) {
        val cent = cb(c)
        var acc = 0.0
        var t = 0
        while (t < dsub) {
          val diff = x(j * dsub + t) - cent(t)
          acc += diff * diff
          t += 1
        }
        out(j * ksub + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def score(lut: ArrayData, codes: Array[Byte]): Double = {
    val m = codes.length
    if (m == 0 || lut.numElements() % m != 0) return -1.0
    val ksub = lut.numElements() / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      val c = codes(j) & 0xFF
      if (c >= ksub) return -1.0
      acc += lut.getDouble(j * ksub + c)
      j += 1
    }
    acc
  }
}

/** PQ code assignment: byte `j` of the result is the index of the nearest
  * (squared-L2, after unit-normalizing the whole vector) centroid of
  * subspace `j`. Ties break toward the lower index — deterministic across
  * engines and runs.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val (m, ksub, dsub) = PqKernels.shape(codebooks)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_encode needs array<float>, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], codebooks, m, ksub, dsub)

  // shared precompiled kernel — see SortedIntersectSize.doGenCode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |final byte[] $r = graft.functions.PqKernels.encode($v, $cbRef, $m, $ksub, $dsub);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  // Value equality over the codebook tensor (see [[NearestCentroid]]):
  // reference equality would defeat canonicalization / exchange reuse.
  override def equals(other: Any): Boolean = other match {
    case p: PqEncode =>
      child == p.child && java.util.Arrays.deepEquals(
        codebooks.asInstanceOf[Array[AnyRef]], p.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftBridge.toColumn(PqEncode(GraftBridge.toExpression(vec), codebooks))
}

/** Per-QUERY asymmetric-distance lookup table: element `j*ksub + c` is the
  * squared L2 distance between the unit-normalized query's subvector `j`
  * and centroid `c` of subspace `j`. Computed once per query row
  * (O(dim·ksub)); every candidate pair after that is just `m` lookups.
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val (m, ksub, dsub) = PqKernels.shape(codebooks)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_lut needs array<float>, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    PqKernels.lut(v.asInstanceOf[ArrayData], codebooks, m, ksub, dsub)

  // shared precompiled kernel — see SortedIntersectSize.doGenCode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |final org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.PqKernels.lut($v, $cbRef, $m, $ksub, $dsub);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override def equals(other: Any): Boolean = other match {
    case p: PqLut =>
      child == p.child && java.util.Arrays.deepEquals(
        codebooks.asInstanceOf[Array[AnyRef]], p.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqLut {
  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftBridge.toColumn(PqLut(GraftBridge.toExpression(vec), codebooks))
}

/** The ADC hot loop: approximate squared distance = Σ_j lut[j·ksub +
  * codes[j]] — `m` array reads per candidate pair, zero vector math.
  * `ksub` is derived from the operand shapes (lut.length / codes.length);
  * a shape mismatch (codes from a different `m`, lut from a different
  * codebook size) yields null rather than a silently wrong sum.
  */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, false), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, true), BinaryType) => TypeCheckResult.TypeCheckFailure(
        "pq_adc_score needs a lut with non-nullable elements ([[PqLut]] output is " +
          "containsNull=false); the eval loop reads cells unguarded, so a null element " +
          "would silently score as 0.0 instead of nulling the distance")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score needs (array<double> lut, binary codes), got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = PqKernels.score(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]])
    if (r == -1.0) null else r
  }

  // shared precompiled kernel — see SortedIntersectSize.doGenCode. -1.0
  // is the shape-mismatch sentinel: real ADC distances are sums of
  // squared differences, never negative.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |final double $r = graft.functions.PqKernels.score($a, $b);
         |if ($r == -1.0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  def apply(lut: Column, codes: Column): Column =
    GraftBridge.toColumn(PqAdcScore(GraftBridge.toExpression(lut), GraftBridge.toExpression(codes)))
}
