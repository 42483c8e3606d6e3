package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** SQL statement face for the copy-on-write layout operators: route
  * `DELETE FROM t WHERE …` / `UPDATE t SET … WHERE …` over cataloged
  * path-addressed parquet tables through [[graft.io.Store.deleteWhere]] /
  * [[graft.io.Store.updateWhere]].
  *
  * Stock Spark parses and fully ANALYZES both statements against a v1
  * parquet table, then rejects them at planning ("Table does not support
  * DELETE" — row-level ops are a v2-catalog capability). This rule runs in
  * the post-optimizer slot (`extraOptimizations` /
  * `injectOptimizerRule`, exactly like [[BandJoinRewrite]]) — i.e. after
  * analysis proved the statement well-typed against the table schema and
  * before the planner would throw — and replaces the unplannable node
  * with a runnable command over the journaled COW machinery: one
  * pushed-predicate scan locates the match-bearing files, only those are
  * rewritten (re-staged through the table's own curve when it has layout
  * provenance), untouched files never move, prior epochs stay readable
  * via readVersion. The command returns Delta-style affected-row/file
  * counts.
  *
  * Deliberately narrow preconditions — rewrite ONLY when:
  *   - the target resolves to a v1 `LogicalRelation` over a parquet
  *     `HadoopFsRelation` with exactly one root path. Partitioned
  *     (`dt=`-style) tables are admitted: the COW core re-stages
  *     replacement files per partition directory (values preserved), and
  *     a predicate on the partition columns partition-prunes the locate
  *     scan itself — the most common lakehouse takedown
  *     (`DELETE FROM t WHERE dt = …`) touches only its own directories;
  *   - the condition (and every UPDATE SET value) is deterministic and
  *     subquery-free — the expressions are re-resolved by name against a
  *     fresh scan inside the command, which cannot host another plan;
  *   - every UPDATE SET key is a plain top-level column.
  * Anything else falls through to Spark's own (loud) unsupported error —
  * never a silent behavior change.
  */
object SqlDmlRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case d @ DeleteFromTable(rel, cond) =>
      locate(rel) match {
        case Some((baseDir, name, table)) if expressible(cond, rel) =>
          // the command carries the RESOLVED condition (an unresolved one
          // would flunk the optimizer's stays-resolved validation); it is
          // re-targeted by NAME against the command's own scan at run time
          GraftCowDeleteCommand(baseDir, name, table, cond)
        case _ => d
      }
    case u @ UpdateTable(rel, assignments, cond) =>
      val condOk = cond.forall(c => expressible(c, rel))
      val setsOk = assignments.forall(a =>
        a.key.isInstanceOf[AttributeReference] && expressible(a.value, rel))
      locate(rel, admitV2 = true) match {
        case Some((baseDir, name, table)) if condOk && setsOk =>
          val sets = assignments.map(a =>
            a.key.asInstanceOf[AttributeReference].name -> a.value)
          GraftCowUpdateCommand(baseDir, name, table, cond, sets)
        case _ => u
      }
    case m: MergeIntoTable => rewriteMerge(m).getOrElse(m)
  }

  /** `MERGE INTO` over a cataloged path-addressed parquet table — stock
    * Spark analyzes and optimizes it fully against a v1 relation and only
    * rejects at planning (the DELETE/UPDATE hook, verified empirically),
    * so the same post-optimizer slot routes it to the journaled
    * [[graft.io.Store.mergeInto]]. Narrow by construction: one matched
    * action (UPDATE SET with plain-column keys, or DELETE), one
    * not-matched INSERT, no not-matched-BY-SOURCE clauses, no schema
    * evolution, every expression deterministic/subquery-free and bound to
    * the two relations. Anything else falls through to Spark's own loud
    * unsupported error.
    */
  private def rewriteMerge(m: MergeIntoTable): Option[GraftCowMergeCommand] = {
    val tgtOut = m.targetTable.outputSet
    val srcOut = m.sourceTable.outputSet
    def ok(e: Expression): Boolean =
      e.deterministic && !SubqueryExpression.hasSubquery(e) &&
        e.references.subsetOf(tgtOut ++ srcOut)
    def okSrc(e: Expression): Boolean =
      e.deterministic && !SubqueryExpression.hasSubquery(e) &&
        e.references.subsetOf(srcOut)
    if (m.withSchemaEvolution || m.notMatchedBySourceActions.nonEmpty || !ok(m.mergeCondition))
      return None
    // the ORDERED matched-clause list (first match wins — the CDC-apply
    // shape: gated DELETE tombstones before the catch-all UPDATE); every
    // clause must translate or the whole statement falls through
    val matchedTranslated: Seq[Option[MergeClauseSpec]] = m.matchedActions.map {
      case UpdateAction(c, assigns, _)
          if c.forall(ok) && assigns.forall(a =>
            a.key.isInstanceOf[AttributeReference] && ok(a.value)) =>
        Some(MergeClauseSpec(
          Some(assigns.map(a => a.key.asInstanceOf[AttributeReference].name -> a.value)),
          c))
      case DeleteAction(c) if c.forall(ok) => Some(MergeClauseSpec(None, c))
      case _ => None
    }
    val matched: Option[Seq[MergeClauseSpec]] =
      if (matchedTranslated.forall(_.isDefined)) Some(matchedTranslated.flatten)
      else None
    val insert: Option[Option[(Seq[(String, Expression)], Option[Expression])]] =
      m.notMatchedActions match {
        case Seq() => Some(None)
        case Seq(InsertAction(c, assigns))
            if c.forall(okSrc) && assigns.forall(a =>
              a.key.isInstanceOf[AttributeReference] && okSrc(a.value)) =>
          Some(Some(
            (assigns.map(a => a.key.asInstanceOf[AttributeReference].name -> a.value),
              c)))
        case _ => None
      }
    for {
      clauses <- matched
      ins <- insert
      if clauses.nonEmpty || ins.isDefined
      (baseDir, name, table) <- locate(m.targetTable, admitV2 = true)
    } yield GraftCowMergeCommand(baseDir, name, table,
      m.sourceTable, m.mergeCondition, clauses, ins,
      tgtIds = tgtOut.toSeq.map(_.exprId.id),
      srcIds = srcOut.toSeq.map(_.exprId.id))
  }

  /** Unwrap alias layers; accept a single-root v1 parquet relation — flat
    * or partitioned (the COW core re-stages partitioned replacements per
    * `key=value` directory). Returns (store base dir, table leaf rel,
    * display name).
    *
    * With `admitV2` (UPDATE/MERGE only): also accept a
    * [[org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation]]
    * over the graft catalog's own [[graft.sql.GraftTable]] — Spark's
    * analyzer lets both statements through for a v2 table (its own
    * row-level rewrite rules apply only to `SupportsRowLevelOperations`
    * tables) and the planner would throw; routing here gives `graft.t`
    * idents the same journaled COW UPDATE/MERGE the v1 face has, CAS and
    * retires included. `DELETE FROM graft.t` deliberately stays on the
    * catalog's `SupportsDeleteV2` path (one statement, one mechanism).
    * A `VERSION AS OF`-pinned table never reaches here (not addressable
    * as a DML target), and `$history` tables are not GraftTables.
    */
  private def locate(plan: LogicalPlan,
                     admitV2: Boolean = false): Option[(String, String, String)] = plan match {
    case SubqueryAlias(_, child) => locate(child, admitV2)
    case lr: LogicalRelation =>
      lr.relation match {
        case h: HadoopFsRelation
            if h.fileFormat.isInstanceOf[ParquetFileFormat] &&
              h.location.rootPaths.size == 1 &&
              partitionsUnderRoot(lr, h.location.rootPaths.head) =>
          val loc = h.location.rootPaths.head
          val table = lr.catalogTable.map(_.identifier.unquotedString)
            .getOrElse(loc.toString)
          Some((loc.getParent.toString, loc.getName, table))
        case _ => None
      }
    case dsv2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        if admitV2 =>
      dsv2.table match {
        case gt: graft.sql.GraftTable if !gt.isVersionPinned =>
          Some((gt.storeBase, gt.storeRel, gt.name()))
        case _ => None
      }
    // the optimizer's EARLY scan-pushdown batch (before the operator
    // batch this rule runs in) has usually already turned the relation
    // into its scan form — the original relation rides inside
    case sr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
        if admitV2 => locate(sr.relation, admitV2)
    case _ => None
  }

  /** The COW core locates matches by scanning the table ROOT directory, so
    * a catalog partition registered with a custom LOCATION outside the
    * root would be silently invisible to the DML — rows there would
    * survive a DELETE that names them. Admit a partition-tracked table
    * only when every registered partition's location sits under the root
    * (one O(partitions) driver-side metadata listing at admission);
    * anything else — including a metadata listing that fails — falls
    * through to Spark's own loud unsupported-DML error.
    */
  private def partitionsUnderRoot(lr: LogicalRelation, root: Path): Boolean =
    lr.catalogTable.forall { ct =>
      ct.partitionColumnNames.isEmpty || {
        try {
          val spark = SparkSession.active
          val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
          val qroot = fs.makeQualified(root)
          def isUnder(p: Path): Boolean = {
            var c = fs.makeQualified(p)
            while (c != null) { if (c == qroot) return true; c = c.getParent }
            false
          }
          spark.sessionState.catalog.listPartitions(ct.identifier)
            .forall(_.storage.locationUri.forall(u => isUnder(new Path(u))))
        } catch { case scala.util.control.NonFatal(_) => false }
      }
    }

  /** Re-expressible against a fresh scan of the same table: deterministic,
    * no subquery, and every reference is one of the relation's own columns
    * (true after analysis, but cheap to assert — a future Spark could
    * thread outer references in).
    */
  private def expressible(e: Expression, rel: LogicalPlan): Boolean =
    e.deterministic && !SubqueryExpression.hasSubquery(e) &&
      e.references.subsetOf(rel.outputSet)

  /** Resolved attributes -> by-name unresolved ones, so the expression can
    * be re-resolved against the command's own scan (the original exprIds
    * belong to a plan that no longer exists at run time). Applied INSIDE
    * the commands' run() — a stored unresolved expression would make the
    * command plan itself unresolved.
    */
  private[plans] def denorm(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }
}

/** `DELETE FROM` over a path-addressed parquet store, via the journaled
  * copy-on-write [[graft.io.Store.deleteWhere]]. Output mirrors Delta's
  * affected-count convention.
  */
case class GraftCowDeleteCommand(baseDir: String, rel: String, table: String,
                                 cond: Expression) extends LeafRunnableCommand {

  // no output rows: the statement's user-visible schema is the analyzed
  // DeleteFromTable's (empty — this rewrite runs post-analysis), so
  // emitted rows could never surface; the stats live in DeleteStats via
  // the API face
  override def run(spark: SparkSession): Seq[Row] = {
    new graft.io.Store(spark, baseDir)
      .deleteWhere(rel, GraftBridge.toColumn(SqlDmlRewrite.denorm(cond)))
    Seq.empty
  }

  override def simpleString(maxFields: Int): String =
    s"GraftCowDelete $table cond=${cond.sql}"
}

/** One translated MERGE matched clause: UPDATE SET (sets defined) or
  * DELETE (sets None), with the optional `AND` condition.
  */
case class MergeClauseSpec(sets: Option[Seq[(String, Expression)]],
                           cond: Option[Expression])

/** `MERGE INTO` over a path-addressed parquet store, via the journaled
  * copy-on-write [[graft.io.Store.mergeInto]]. The captured expressions
  * stay RESOLVED (an unresolved field would flunk the optimizer's
  * stays-resolved validation) and are re-qualified by exprId — target
  * attributes to `__t`, source to `__s` — inside run(), where the command
  * rebuilds the two-sided join against a fresh scan and the captured
  * source plan.
  */
case class GraftCowMergeCommand(baseDir: String, rel: String, table: String,
                                sourcePlan: LogicalPlan, on: Expression,
                                matched: Seq[MergeClauseSpec],
                                insert: Option[(Seq[(String, Expression)], Option[Expression])],
                                tgtIds: Seq[Long], srcIds: Seq[Long])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(sourcePlan)

  override def run(spark: SparkSession): Seq[Row] = {
    val tgt = tgtIds.toSet
    val src = srcIds.toSet
    def qual(e: Expression): org.apache.spark.sql.Column =
      GraftBridge.toColumn(e.transform {
        case a: AttributeReference if tgt(a.exprId.id) =>
          UnresolvedAttribute(Seq("__t", a.name))
        case a: AttributeReference if src(a.exprId.id) =>
          UnresolvedAttribute(Seq("__s", a.name))
      })
    val sourceDf = GraftBridge.ofRows(spark, sourcePlan)
    val clauses: Seq[graft.io.Store.MergeMatched] = matched.map { cl =>
      cl.sets match {
        case Some(sets) => graft.io.Store.MergeUpdate(
          sets.map { case (n, e) => n -> qual(e) }.toMap, cl.cond.map(qual))
        case None => graft.io.Store.MergeDelete(cl.cond.map(qual))
      }
    }
    new graft.io.Store(spark, baseDir).mergeInto(rel, sourceDf, qual(on),
      clauses,
      insert.map { case (sets, c) =>
        (sets.map { case (n, e) => n -> qual(e) }.toMap, c.map(qual))
      })
    Seq.empty
  }

  override def simpleString(maxFields: Int): String =
    s"GraftCowMerge $table on=${on.sql}"
}

/** `UPDATE … SET` over a path-addressed parquet store, via the journaled
  * copy-on-write [[graft.io.Store.updateWhere]].
  */
case class GraftCowUpdateCommand(baseDir: String, rel: String, table: String,
                                 cond: Option[Expression],
                                 sets: Seq[(String, Expression)])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.lit
    val c = cond.map(e => GraftBridge.toColumn(SqlDmlRewrite.denorm(e)))
      .getOrElse(lit(true))
    new graft.io.Store(spark, baseDir)
      .updateWhere(rel, c, sets.map { case (n, e) =>
        n -> GraftBridge.toColumn(SqlDmlRewrite.denorm(e)) }.toMap)
    Seq.empty
  }

  override def simpleString(maxFields: Int): String =
    s"GraftCowUpdate $table set=${sets.map(_._1).mkString(",")}"
}
