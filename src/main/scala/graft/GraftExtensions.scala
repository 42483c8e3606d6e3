package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{FloatDotProduct, Int8DotProduct, KgramHashMinMax, SortedIntersectSize}

/** SQL-surface registration for graft's custom Catalyst expressions.
  *
  * Two entry points:
  *   - config: `spark.sql.extensions=graft.GraftExtensions` — injected at
  *     session build, available in every `spark.sql(...)`;
  *   - [[GraftExtensions.register]]: imperative registration on an existing
  *     session (used by the specs; the Verify/Bench mains run the declared
  *     queries through the Column API and need no registration).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "sorted_intersect_size(a, b) takes 2 arguments")
        SortedIntersectSize(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("float_dot_product"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "float_dot_product(a, b) takes 2 arguments")
        FloatDotProduct(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("int8_dot_product"),
      new ExpressionInfo(classOf[Int8DotProduct].getName, "int8_dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "int8_dot_product(a, b) takes 2 arguments")
        Int8DotProduct(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("kgram_hash_minmax"),
      new ExpressionInfo(classOf[KgramHashMinMax].getName, "kgram_hash_minmax"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.mkKgram(exprs)))
    // HyperplaneBucket / NearestCentroid carry a literal plane/centroid
    // matrix and are deliberately NOT exposed to SQL — a matrix cannot be
    // written as a SQL argument; use the Column API (SimSearch) instead.
    // CmsEstimate likewise rides a megabyte-scale sketch blob (a hex
    // binary literal is impractical to write) — use the Column API
    // (TextStats.frequentSpans / functions.CmsEstimate).

    // Optimizer rule: naive `abs(l - r) <= tol` band joins become
    // overlap-bucket equi-joins instead of nested-loop joins.
    e.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
    // SQL DML face: DELETE FROM / UPDATE over path-addressed parquet
    // tables route through the journaled copy-on-write Store ops instead
    // of Spark's "not supported with v1 tables" planner error.
    e.injectOptimizerRule(_ => graft.plans.SqlDmlRewrite)
  }
}

object GraftExtensions {

  /** `kgram_hash_minmax(text, k)` — k must be an integer literal (it
    * parameterizes the generated loop, so it cannot vary per row).
    */
  private[graft] def mkKgram(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 2, "kgram_hash_minmax(text, k) takes 2 arguments")
    val k = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other =>
        throw new IllegalArgumentException(
          s"kgram_hash_minmax: k must be an integer literal, got $other")
    }
    KgramHashMinMax(exprs(0), k)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_size",
      exprs => {
        require(exprs.length == 2, "sorted_intersect_size(a, b) takes 2 arguments")
        SortedIntersectSize(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot_product",
      exprs => {
        require(exprs.length == 2, "float_dot_product(a, b) takes 2 arguments")
        FloatDotProduct(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_dot_product",
      exprs => {
        require(exprs.length == 2, "int8_dot_product(a, b) takes 2 arguments")
        Int8DotProduct(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kgram_hash_minmax", mkKgram, "built-in")
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BandJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.SqlDmlRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.SqlDmlRewrite
  }
}
