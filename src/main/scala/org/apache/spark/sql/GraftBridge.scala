package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 made `Column.expr` / `new Column(expr)` private to the sql
  * package (`org.apache.spark.sql.classic.ExpressionUtils`); this shim is
  * the single sanctioned crossing point for our library.
  */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A Column's EAGER catalyst tree. [[toExpression]] wraps the Column's
    * lazy ColumnNode ([[classic.ColumnNodeExpression]]); Column-API
    * composition (`===`, `&&`) builds `UnresolvedFunction("=", "and")`
    * NODES that only become `EqualTo`/`And` at analysis. Structural
    * inspection (e.g. pulling partition-key equalities out of a MERGE's
    * ON) needs the converted tree — note the function names survive as
    * `analysis.UnresolvedFunction` until resolution, so matchers must
    * handle both spellings.
    */
  def toCatalyst(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Whether `df`'s plan is already in the session cache — the guard a
    * materialize-then-unpersist scope needs so it never drops a CALLER's
    * cache: `persist()` on an already-cached plan is a warning no-op, but
    * the paired `unpersist()` would evict the caller's entry and silently
    * de-optimize every later use (the cache manager is sql-private).
    */
  def isCached(df: Dataset[_]): Boolean = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    ds.sparkSession.sharedState.cacheManager.lookupCachedData(ds).isDefined
  }

  /** A DataFrame over an already-analyzed plan — the SQL MERGE command
    * re-executes its captured source plan through this (`Dataset.ofRows`
    * is sql-package-private in Spark 4).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
