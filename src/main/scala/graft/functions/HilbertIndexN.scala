package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, LongType}

/** n-dimensional Hilbert curve index of `bits`-bit bucket ranks, via
  * Skilling's transform (John Skilling, "Programming the Hilbert Curve",
  * AIP Conf. Proc. 707, 2004 — the standard public n-D generalization of
  * [[HilbertIndex2]]'s 2-D rotate-and-accumulate): axes are mapped to the
  * transposed Hilbert form in place (inverse-undo + Gray encode), then
  * the index is the bit-interleave of the transposed words.
  *
  * Adopted for [[graft.io.Store.writeZordered]]'s 3+-key layouts on a
  * measured win over Morton interleaving (CurveAb 3-D tier, PLANS.md
  * round 15): at 256 files on (user_id, ts, value), mean files touched
  * per single-column predicate drops ~20% and per two-sided pair ~41% —
  * the same no-jump-locality mechanism as 2-D, diluted but decisively
  * present. The curve's orientation differs from xy2d by a reflection;
  * locality (what the layout buys) is identical.
  *
  * The transform is a fixed nested loop over (bits x dims); generated
  * code calls the shared static `compute` rather than unrolling —
  * O(bits*n) ALU work per row at write time only, invisible next to the
  * layout's range exchange. Null in any rank yields null (callers bucket
  * nulls to rank 0 upstream).
  */
case class HilbertIndexN(children: Seq[Expression], bits: Int) extends Expression {

  private val n = children.size
  require(n >= 2, s"hilbert_index_n needs >= 2 dimensions, got $n")
  require(bits >= 1 && bits * n <= 62,
    s"bits * dims must fit a long, got $bits * $n")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index_n needs bigint bucket ranks, got " +
        children.map(_.dataType).mkString(", "))

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertIndexN.compute(xs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val xs = ctx.freshName("axes")
    val fill = evals.zipWithIndex.map { case (e, i) =>
      code"""
        |if (!${ev.isNull}) {
        |  ${e.code}
        |  if (${e.isNull}) { ${ev.isNull} = true; } else { $xs[$i] = ${e.value}; }
        |}"""
    }.reduce(_ + _)
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long ${ev.value} = 0L;
        |long[] $xs = new long[$n];
        |$fill
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.functions.HilbertIndexN.compute($xs, $bits);
        |}""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object HilbertIndexN {

  def apply(cols: Seq[Column], bits: Int): Column =
    GraftBridge.toColumn(HilbertIndexN(cols.map(GraftBridge.toExpression), bits))

  /** Shared by eval, generated code (static forwarder), and tests. */
  def compute(axes: Array[Long], bits: Int): Long = {
    val n = axes.length
    val x = axes.clone()
    val m = 1L << (bits - 1)
    // inverse undo excess work
    var q = m
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1L) { if ((x(n - 1) & q) != 0L) t ^= q - 1L; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transposed words -> index, X(0)'s bit most significant per level
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) { h = (h << 1) | ((x(i) >> b) & 1L); i += 1 }
      b -= 1
    }
    h
  }
}
