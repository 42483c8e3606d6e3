package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point estimate from a serialized count-min sketch — the PROBE side Spark
  * does not ship (it has the `count_min_sketch` aggregate to BUILD one, and
  * a probe expression only for Bloom filters). The sketch bytes ride the
  * expression as a constant, deserialize once per task (transient lazy),
  * and each row costs `depth` array reads — no join, no shuffle, the same
  * map-only discipline as `BloomFilterMightContain`.
  *
  * The estimate is one-sided (never BELOW the true count, Cormode &
  * Muthukrishnan 2005), which is what makes a CMS prefilter EXACT when
  * composed with a confirm pass: no key with true count >= T can estimate
  * below T, so filtering on the estimate never loses a frequent key.
  */
case class CmsEstimate(bytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  @transient private lazy val cms: CountMinSketch = CountMinSketch.readFrom(bytes)

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cms_estimate needs bigint, got $t")
  }

  override def nullSafeEval(v: Any): Any = estimate(v.asInstanceOf[Long])

  /** Shared by interpreted and generated paths; boxes to route through the
    * public `estimateCount(Object)` long-item path — the same hashing the
    * `count_min_sketch` aggregate used on the build side.
    */
  def estimate(v: Long): Long = cms.estimateCount(java.lang.Long.valueOf(v))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimate", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.estimate($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // the blob is payload, not identity-by-content printing material
  override def toString: String = s"cms_estimate(${bytes.length}B, $child)"
}

object CmsEstimate {
  def apply(bytes: Array[Byte], value: Column): Column =
    GraftBridge.toColumn(CmsEstimate(bytes, GraftBridge.toExpression(value)))

  /** Build the count-min sketch this expression probes: one partial-agg'd
    * `count_min_sketch` over `value`, collected as bytes (the sketch is
    * (eps, confidence)-grid-sized, independent of data volume). The seed
    * is FIXED — every probe site must use the sketch its own build
    * produced, and a shared helper keeps the seed/collect semantics in
    * one place instead of three copy-pasted blocks (x40 / x43 / x29).
    */
  def sketchOf(df: org.apache.spark.sql.DataFrame, value: Column,
               eps: Double, confidence: Double = 0.99): Array[Byte] =
    df.agg(org.apache.spark.sql.functions.count_min_sketch(
        value,
        org.apache.spark.sql.functions.lit(eps),
        org.apache.spark.sql.functions.lit(confidence),
        org.apache.spark.sql.functions.lit(42)))
      .head.getAs[Array[Byte]](0)
}
