package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a naive numeric band join
  * `a JOIN b ON abs(a.x - b.y) <= tol` into the overlap-bucket equi-join
  * [[graft.operators.AsofJoin]] builds by hand.
  *
  * Without an equi-key Catalyst can only plan a band predicate as a
  * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons and a broadcast whole
  * side — which is exactly the trap a user writing the natural condition
  * falls into at 100 TB. The rewrite buckets both sides by
  * `floor(x / tol)`: |x−y| <= tol implies the bucket ids differ by at most
  * 1 (floor is 1-Lipschitz after dividing by tol), so exploding the right
  * side into its 3 adjacent buckets and equi-joining on the bucket id
  * covers every qualifying pair. The original predicate is kept, so extra
  * bucket-mates are filtered exactly; the 3 exploded bucket ids are
  * distinct, so no pair can match twice. Net: a hash-partitionable join
  * whose shuffle both sides stream through once, at the cost of 3x the
  * (narrow) right side.
  *
  * Deliberately narrow preconditions — rewrite ONLY when:
  *   - inner join whose condition's conjuncts include
  *     `abs(l − r) <= tol` (either comparison order) with `tol` a positive
  *     numeric literal, one subtraction side referencing only the left
  *     plan and the other only the right;
  *   - NO conjunct is already a cross-side equality (then Catalyst has an
  *     equi-key and hash-plans it fine — AsofJoin's own pre-bucketed join
  *     lands here and must not be double-bucketed);
  *   - both band expressions are plain numerics (timestamps arrive here
  *     already cast by the caller) AND deterministic — a non-deterministic
  *     band expression (e.g. involving rand()) would be evaluated once for
  *     the bucket and again in the kept original predicate, two different
  *     draws, silently changing results;
  *   - the bucket ids can be computed EXACTLY: float/double/byte/short/int
  *     expressions bucket in double arithmetic (every int is exact in a
  *     double), and long expressions bucket in pure long arithmetic when
  *     the tolerance is integral — routing longs through double would
  *     round values beyond 2^53 (ulp at 1e18 is 256), letting two truly
  *     qualifying values land in buckets 2 apart and DROPPING their pair
  *     from the join output. Decimal bands and fractional-tolerance longs
  *     are left to the nested-loop plan: slow but correct.
  *
  * Registered via `spark.sql.extensions=graft.GraftExtensions` or
  * `spark.experimental.extraOptimizations` (tests, Verify/Bench mains).
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasCrossEquality = conjuncts.exists {
        case EqualTo(a, b) => crossSides(a, b, left, right)
        case EqualNullSafe(a, b) => crossSides(a, b, left, right)
        case _ => false
      }
      if (hasCrossEquality) j
      else conjuncts.collectFirst(Function.unlift(asBand(_, left, right))) match {
        case Some((lExpr, rExpr, tol)) => rewrite(j, lExpr, rExpr, tol)
        case None => j
      }
  }

  private def crossSides(a: Expression, b: Expression,
                         left: LogicalPlan, right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
      a.references.nonEmpty && b.references.nonEmpty) ||
      (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet) &&
        a.references.nonEmpty && b.references.nonEmpty)

  /** Matches `abs(x − y) <= tol` / `tol >= abs(x − y)` and orients (x, y)
    * as (left-side, right-side). Returns (leftExpr, rightExpr, tol).
    */
  private def asBand(e: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Double)] = {
    def orient(x: Expression, y: Expression): Option[(Expression, Expression)] =
      if (x.references.subsetOf(left.outputSet) && x.references.nonEmpty &&
        y.references.subsetOf(right.outputSet) && y.references.nonEmpty) Some((x, y))
      else if (y.references.subsetOf(left.outputSet) && y.references.nonEmpty &&
        x.references.subsetOf(right.outputSet) && x.references.nonEmpty) Some((y, x))
      else None
    def tolOf(lit: Expression): Option[Double] = lit match {
      case Literal(v: java.lang.Number, _: NumericType) if v.doubleValue() > 0 =>
        Some(v.doubleValue())
      case Literal(d: org.apache.spark.sql.types.Decimal, _) if d.toDouble > 0 =>
        Some(d.toDouble)
      case _ => None
    }
    def numeric(x: Expression) = x.dataType.isInstanceOf[NumericType]
    def ok(x: Expression, y: Expression) =
      numeric(x) && numeric(y) && x.deterministic && y.deterministic
    e match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), lit) if ok(x, y) =>
        for (t <- tolOf(lit); o <- orient(x, y); if bucketable(o._1, o._2, t))
          yield (o._1, o._2, t)
      case GreaterThanOrEqual(lit, Abs(Subtract(x, y, _), _)) if ok(x, y) =>
        for (t <- tolOf(lit); o <- orient(x, y); if bucketable(o._1, o._2, t))
          yield (o._1, o._2, t)
      case _ => None
    }
  }

  /** The types for which an EXACT bucket id expression exists (see the
    * scaladoc precondition): both sides must take the same strategy so the
    * cross-side adjacency argument runs in one arithmetic. */
  private def bucketable(x: Expression, y: Expression, tol: Double): Boolean =
    (doubleSafe(x.dataType) && doubleSafe(y.dataType)) ||
      (x.dataType == LongType && y.dataType == LongType &&
        tol.isWhole && tol <= Long.MaxValue.toDouble)

  /** Every value of these types is exactly representable as a double, so
    * `floor(x / tol)` in double arithmetic is 1-Lipschitz-safe. */
  private def doubleSafe(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType | ByteType | ShortType | IntegerType => true
    case _ => false
  }

  private def rewrite(j: Join, lExpr: Expression, rExpr: Expression,
                      tol: Double): LogicalPlan = {
    // LONG bands bucket in pure long arithmetic: x - pmod(x, t) is the
    // largest multiple of t <= x (pmod is the non-negative remainder), and
    // dividing an exact multiple makes truncation == floor — so the bucket
    // id is exact at every magnitude, where the double path would round
    // values past 2^53. The adjacency invariant |bucket diff| <= 1 is then
    // plain integer math.
    def bucket(x: Expression): Expression =
      if (x.dataType == LongType) {
        val t = Literal(tol.toLong, LongType)
        IntegralDivide(Subtract(x, Pmod(x, t)), t)
      } else Floor(Divide(Cast(x, DoubleType), Literal(tol, DoubleType)))

    val lAlias = Alias(bucket(lExpr), "__band_bucket_l")()
    val newLeft = Project(j.left.output :+ lAlias, j.left)

    val rBucket = bucket(rExpr)
    val arr = CreateArray(Seq(
      Subtract(rBucket, Literal(1L)), rBucket, Add(rBucket, Literal(1L))))
    val rAttr = AttributeReference("__band_bucket_r", LongType, nullable = true)()
    val newRight = Generate(Explode(arr), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(rAttr), child = j.right)

    val newCond = And(EqualTo(lAlias.toAttribute, rAttr), j.condition.get)
    // restore the original output (the bucket columns are internal)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}
