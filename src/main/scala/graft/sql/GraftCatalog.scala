package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDeleteV2, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource-v2 catalog face for the manifest-tracked layout stores —
  * the native-SQL sibling of [[graft.io.Store.registerSnapshotView]] /
  * [[graft.io.Store.registerVersionView]] with NOTHING to re-pin:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",      classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.base", "/data/stores")
  *   spark.sql("SELECT ... FROM graft.events_z")                  -- committed epoch
  *   spark.sql("SELECT ... FROM graft.events_z VERSION AS OF 3")  -- time travel
  *   spark.sql("SELECT * FROM graft.`events_z$history`")          -- epoch history
  *   spark.sql("DELETE FROM graft.events_z WHERE user_id = 7")    -- journaled COW
  * }}}
  *
  * `loadTable` runs per statement resolution, resolving the table's
  * MANIFEST (committed epoch, or the `VERSION AS OF` epoch's snapshot)
  * into an explicit file set — so a pure-SQL consumer always reads
  * exactly one committed epoch and can never hit the mid-journal listing
  * window, with zero registration bookkeeping: every query follows the
  * pointer afresh (the metastore/DVC pointer-read discipline;
  * GraftCatalogSpec pins exactness through a manufactured mid-replay
  * state). The returned table wraps Spark's own v2 `ParquetTable`, so
  * scans keep the stock `ParquetScanBuilder` pushdown/pruning machinery
  * (spec pins the PushedFilters witness); resolution itself is two
  * directory listings of metadata — O(files), no data pages. Managed
  * PARTITIONED stores anchor their scan at the table root, so the
  * `key=value` columns reconstruct across live and nested-retired files.
  *
  * Identifiers map to store paths: `graft.a.b.t` -> `<base>/a/b/t`
  * (namespace segments are subdirectories). `` graft.`t$history` `` is
  * the epoch-history metadata table (the `DESCRIBE HISTORY` role): one
  * row per readable epoch — (version, committed_at, files, is_current) —
  * served driver-side as a LocalScan, so a SQL user can DISCOVER epochs
  * and feed them to `VERSION AS OF` without leaving SQL.
  *
  * Writes: the catalog stays CREATE/ALTER/DROP/INSERT-refusing — the only
  * write paths to a manifest-tracked table are the journaled Store
  * mutators — but `DELETE FROM` is supported by ROUTING to exactly that
  * machinery: [[GraftTable.deleteWhere]] translates the pushed v2
  * predicates back to Columns and runs the journaled copy-on-write
  * [[graft.io.Store.deleteWhere]] under the epoch CAS (replaced files
  * retire; the takedown is time-travel-recoverable). A predicate the
  * partial translator cannot express falls through loudly to Spark's own
  * unsupported-DELETE error — never a silent behavior change.
  *
  * Failure modes mirror the API face: a vacuumed or never-committed
  * `VERSION AS OF` epoch and a manifest-less directory stay loud
  * ([[graft.io.Store.readVersion]]'s messages); a nonexistent path is
  * the analyzer's ordinary TABLE_OR_VIEW_NOT_FOUND.
  */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var base: String = _

  /** `CALL graft.<proc>(…)` — the SQL face of the MAINTENANCE loop, so an
    * operator never leaves SQL to run it: `vacuum`, `optimize` (the
    * scoped recluster), `erosion` (measure only), `maintain` (the full
    * measured daily cycle), `release_stale_claims`. Reads stay reads and
    * writes stay journaled: every procedure routes to the same Store
    * operator the API face runs, epoch CAS included. Iceberg's
    * `CALL cat.system.proc` spelling is accepted too.
    */
  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    val ns = ident.namespace().toSeq
    // proper not-found classification (4.1.2 ships no NoSuchProcedureException
    // class, so the error-class form carries the contract): ProcedureCatalog
    // callers — EXISTS checks, SHOW PROCEDURES — must see a ROUTINE_NOT_FOUND
    // AnalysisException, not an internal RuntimeException
    if (ns.nonEmpty && ns != Seq("system"))
      throw GraftProcedures.notFound(
        (Seq(catalogName) ++ ns :+ ident.name()).mkString("."))
    GraftProcedures.load(catalogName, base, ident.name())
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.nonEmpty && namespace.toSeq != Seq("system")) Array.empty
    else GraftProcedures.Names.map(n => Identifier.of(namespace, n)).toArray

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    base = Option(options.get("base")).getOrElse(throw new IllegalArgumentException(
      s"graft catalog '$name' needs spark.sql.catalog.$name.base = <store base dir>"))
  }

  override def name(): String = catalogName

  /** `SHOW TABLES [IN <catalog>.<ns>]`: one listing of the namespace's
    * directory, keeping exactly the children that carry a layout
    * manifest — the same "manifest-tracked or refused" contract as
    * [[loadTable]], so everything listed is loadable and nothing listed
    * is a listing-semantics dir this catalog would refuse to serve.
    */
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val spark = SparkSession.active
    val root = new org.apache.hadoop.fs.Path((base +: namespace).mkString("/"))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        graft.io.LayoutManifest.exists(fs, st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def loadTable(ident: Identifier): Table =
    if (ident.name().endsWith(GraftCatalog.HistorySuffix)) history(ident)
    else load(ident, None)

  /** `VERSION AS OF <epoch>` — the SQL face of [[graft.io.Store.readVersion]]. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val epoch =
      try version.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft time travel takes a manifest EPOCH number, got '$version' " +
            s"(available: the `${ident.name()}$$history` metadata table)")
      }
    load(ident, Some(epoch))
  }

  /** `TIMESTAMP AS OF <ts>` — maps the wall-clock to the NEWEST epoch
    * committed at or before it (Delta's semantics), using the same
    * commit times the `$history` table reports. A timestamp before the
    * first epoch is loud: there was no table to read then.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val spark = SparkSession.active
    val rel = (ident.namespace() :+ ident.name()).mkString("/")
    val store = new graft.io.Store(spark, base)
    if (!store.exists(rel)) throw new NoSuchTableException(ident)
    val history = store.versionHistory(rel)
    val at = history.filter(_.committedAtMs * 1000L <= timestampMicros)
    if (at.isEmpty) throw new IllegalArgumentException(
      s"no epoch of $catalogName.$rel was committed at or before " +
        s"timestamp $timestampMicros us (earliest: ${history.headOption
          .map(v => s"epoch ${v.epoch} at ${v.committedAtMs} ms").getOrElse("none")})")
    load(ident, Some(at.map(_.epoch).max))
  }

  private def load(ident: Identifier, epoch: Option[Long]): Table = {
    val spark = SparkSession.active
    val rel = (ident.namespace() :+ ident.name()).mkString("/")
    val store = new graft.io.Store(spark, base)
    if (!store.exists(rel)) throw new NoSuchTableException(ident)
    // manifest-less (plain/partitioned parquet) dirs are deliberately NOT
    // served: this face exists to give SQL the manifest's exactness, and
    // silently falling back to a listing would reopen the exact window it
    // closes — Store.registerCatalog is the listing-semantics face.
    val resolved = epoch match {
      case Some(e) => store.resolveVersion(rel, e)
      case None => store.resolveSnapshot(rel)
    }
    // a managed PARTITIONED store's scan anchors at the table root so the
    // `key=value` columns reconstruct for live and nested-retired files
    // alike (Store.readVersion's discipline, through the v2 file index)
    val options =
      if (resolved.partCols.nonEmpty)
        new CaseInsensitiveStringMap(
          java.util.Collections.singletonMap("basePath", s"$base/$rel"))
      else CaseInsensitiveStringMap.empty()
    // an EVOLVED epoch's declared schema rides as the user-specified
    // schema: FileTable subtracts the inferred partition columns and
    // re-appends them, so old files project the added columns as null
    // with zero footer reads beyond the stock resolution
    new GraftTable(ParquetTable(s"$catalogName.$rel", spark,
      options, resolved.paths, resolved.schema, classOf[ParquetFileFormat]),
      base, rel, versionPinned = epoch.isDefined,
      partitioned = resolved.partCols.nonEmpty)
  }

  /** The `` `t$history` `` metadata table: one row per readable epoch. */
  private def history(ident: Identifier): Table = {
    val spark = SparkSession.active
    val rel = (ident.namespace() :+
      ident.name().stripSuffix(GraftCatalog.HistorySuffix)).mkString("/")
    val store = new graft.io.Store(spark, base)
    if (!store.exists(rel)) throw new NoSuchTableException(ident)
    val rows = store.versionHistory(rel).map { v =>
      InternalRow(v.epoch, v.committedAtMs * 1000L /* micros */ ,
        v.files, v.isCurrent)
    }.toArray
    new GraftHistoryTable(s"$catalogName.$rel$$history", rows)
  }

  private def readOnly(op: String): Nothing = throw new UnsupportedOperationException(
    s"graft catalog '$catalogName' is read-only ($op): mutate through the journaled " +
      "Store operators (writeZordered/appendZordered/deleteWhere/updateWhere/...), " +
      "which hold the epoch CAS and retire replaced files for time travel")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table =
    readOnly("CREATE TABLE")

  /** `ALTER TABLE graft.t ADD COLUMN(S)` — the ONE admitted DDL mutation,
    * because it routes to the journaled schema-evolution epoch
    * ([[graft.io.Store.addColumns]]): a metadata-only commit, no data
    * rewritten, every epoch keeps its own schema under `VERSION AS OF`.
    * Everything else (DROP/RENAME COLUMN, type changes, NOT NULL adds,
    * positioned adds, comments/properties) changes what existing bytes
    * mean without rewriting them — refused loudly, with the same
    * mutate-through-the-Store message as the other DDL.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    if (adds.isEmpty || adds.size != changes.size)
      readOnly("ALTER TABLE — only ADD COLUMN(S) is supported; " +
        "drops/renames/type changes need a rewrite")
    adds.foreach { a =>
      if (a.fieldNames().length != 1)
        readOnly("ALTER TABLE ADD COLUMN into a nested field")
      if (a.position() != null)
        readOnly("ALTER TABLE ADD COLUMN with a position (FIRST/AFTER) — " +
          "new columns append before the partition columns")
      if (a.defaultValue() != null)
        readOnly("ALTER TABLE ADD COLUMN with a DEFAULT value")
      if (!a.isNullable)
        readOnly("ALTER TABLE ADD COLUMN NOT NULL — existing files read " +
          "the new column as null")
    }
    val spark = SparkSession.active
    val rel = (ident.namespace() :+ ident.name()).mkString("/")
    val store = new graft.io.Store(spark, base)
    if (!store.exists(rel)) throw new NoSuchTableException(ident)
    store.addColumns(rel, StructType(adds.map(a =>
      org.apache.spark.sql.types.StructField(a.fieldNames().head, a.dataType(),
        nullable = true))))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}

object GraftCatalog {

  /** Iceberg-style metadata-table marker: `` graft.`events$history` ``. */
  val HistorySuffix = "$history"

  /** Partial v1-Filter -> Column translator for the v2 DELETE face: the
    * supported surface is exactly what one writes in a takedown WHERE
    * clause (comparisons, IN, null tests, string matches, AND/OR/NOT).
    * Returns None on anything else — the caller reports non-translatable
    * and Spark surfaces its own loud unsupported-DELETE error, pointing
    * the user at the v1 `registerCatalog` face / the API mutators.
    */
  private[sql] def toColumn(f: org.apache.spark.sql.sources.Filter):
      Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v) => Some(col(a) === lit(v))
      case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case GreaterThan(a, v) => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v) => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case And(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
      case Or(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
      case Not(c) => toColumn(c).map(!_)
      case StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case StringContains(a, v) => Some(col(a).contains(v))
      case AlwaysTrue() => Some(lit(true))
      case AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }

  /** Runtime (join-time) file pruning for a partitioned graft scan — the
    * [[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]]
    * translation: the DPP predicates arrive as v2 [[Predicate]]s over the
    * partition columns; every fully-translatable one becomes a catalyst
    * expression RESOLVED against the scan's partition schema (name-bound
    * AttributeReferences — exactly what the file index's partition pruner
    * transforms by name) and rides the wrapped ParquetScan's own
    * `partitionFilters`, so the re-planned batch lists only the matching
    * partitions' files. A predicate that does not translate or reference
    * partition columns only is DROPPED — pruning is an optimization; the
    * join itself re-applies the condition.
    */
  private[graft] def runtimeFilteredScan(
      scan: org.apache.spark.sql.execution.datasources.v2.FileScan,
      predicates: Array[Predicate]):
      Option[org.apache.spark.sql.execution.datasources.v2.FileScan] = {
    import org.apache.spark.sql.{sources => sf}
    import org.apache.spark.sql.catalyst.{expressions => ce}
    val ps = scan.fileIndex.partitionSchema
    if (ps.isEmpty || predicates.isEmpty) return None
    // DIRECT sources.Filter -> catalyst translation, fully RESOLVED and
    // interpretable (the file index's partition pruner evaluates these
    // with an interpreted Predicate — a Column-built tree would carry
    // UnresolvedFunction nodes it cannot eval). Attribute binding is by
    // NAME against the partition schema; Literal.create converts the v1
    // filters' external values (java.sql.Date etc.) to internal form.
    def attr(name: String): Option[ce.AttributeReference] =
      ps.fields.find(_.name.equalsIgnoreCase(name))
        .map(f => ce.AttributeReference(f.name, f.dataType, nullable = true)())
    def litFor(a: ce.AttributeReference, v: Any): ce.Expression =
      ce.Literal.create(v, a.dataType)
    def toExpr(f: sf.Filter): Option[ce.Expression] = f match {
      case sf.EqualTo(a, v) => attr(a).map(x => ce.EqualTo(x, litFor(x, v)))
      case sf.EqualNullSafe(a, v) => attr(a).map(x => ce.EqualNullSafe(x, litFor(x, v)))
      case sf.GreaterThan(a, v) => attr(a).map(x => ce.GreaterThan(x, litFor(x, v)))
      case sf.GreaterThanOrEqual(a, v) => attr(a).map(x => ce.GreaterThanOrEqual(x, litFor(x, v)))
      case sf.LessThan(a, v) => attr(a).map(x => ce.LessThan(x, litFor(x, v)))
      case sf.LessThanOrEqual(a, v) => attr(a).map(x => ce.LessThanOrEqual(x, litFor(x, v)))
      case sf.In(a, vs) => attr(a).map(x => ce.In(x, vs.toIndexedSeq.map(litFor(x, _))))
      case sf.IsNull(a) => attr(a).map(ce.IsNull)
      case sf.IsNotNull(a) => attr(a).map(ce.IsNotNull)
      case sf.And(l, r) => for { lc <- toExpr(l); rc <- toExpr(r) } yield ce.And(lc, rc)
      case sf.Or(l, r) => for { lc <- toExpr(l); rc <- toExpr(r) } yield ce.Or(lc, rc)
      case sf.Not(c) => toExpr(c).map(ce.Not)
      case _ => None
    }
    val exprs = predicates.toSeq.flatMap(p =>
      org.apache.spark.sql.graftshim.GraftShim.predicateToV1(p).flatMap(toExpr))
    if (exprs.isEmpty) None
    else scan match {
      case pq: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        Some(pq.copy(partitionFilters = pq.partitionFilters ++ exprs))
      case _ => None
    }
  }

  private[sql] def translate(predicates: Array[Predicate]):
      Option[org.apache.spark.sql.Column] = {
    val cols = predicates.toSeq.map(p =>
      org.apache.spark.sql.graftshim.GraftShim.predicateToV1(p).flatMap(toColumn(_)))
    if (cols.exists(_.isEmpty)) None
    // an empty predicate array is TRUNCATE: delete everything
    else Some(cols.flatten.foldLeft(lit(true))(_ && _))
  }
}

/** Wrapper over Spark's v2 [[ParquetTable]]: same schema, same scan
  * builder (full pushdown/pruning), but ONLY the BATCH_READ capability —
  * `INSERT INTO graft.t` must fail at analysis rather than write
  * unjournaled files into a manifest-tracked directory. The one mutation
  * served is [[SupportsDeleteV2]], because it ROUTES to the journaled
  * epoch-CAS'd COW machinery rather than bypassing it; a version-pinned
  * table (`VERSION AS OF`) refuses even that — epochs are immutable.
  */
private[graft] class GraftTable(underlying: ParquetTable, baseDir: String,
                                rel: String, versionPinned: Boolean,
                                partitioned: Boolean = false)
    extends Table with SupportsRead with SupportsDeleteV2 {

  /** Store coordinates + pin state, for the post-optimizer DML router
    * ([[graft.plans.SqlDmlRewrite]]): `UPDATE`/`MERGE INTO` over a
    * `graft.t` ident route to the SAME journaled COW core the v1 face
    * uses — the catalog object itself stays read-only.
    */
  private[graft] def storeBase: String = baseDir
  private[graft] def storeRel: String = rel
  private[graft] def isVersionPinned: Boolean = versionPinned

  override def name(): String = underlying.name

  override def schema(): StructType = underlying.schema

  override def partitioning(): Array[Transform] = underlying.partitioning

  override def properties(): java.util.Map[String, String] = underlying.properties

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  /** Batch scans delegate wholesale to the stock parquet builder (the
    * shim preserves pushdown/pruning/metadata by delegation); the
    * streaming entry point serves the EPOCH CHANGELOG — see
    * [[GraftEpochStream]] for the append-only contract and pacing.
    * `.option("maxEpochsPerTrigger", n)` caps the epoch step per
    * micro-batch; `.option("maxFilesPerTrigger", n)` caps the delta-FILE
    * count (whole epochs, at least one) — both admission control.
    * `.option("startingEpoch", n | "latest")` anchors a NEW checkpoint
    * (Delta's `startingVersion` shape): epochs n and newer, or only
    * changes after start.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new org.apache.spark.sql.graftshim.GraftStreamingScanBuilder(
      underlying.newScanBuilder(options)
        .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder],
      mkStream = (readSchema, _) => {
        if (versionPinned) throw new UnsupportedOperationException(
          s"$name is pinned to a manifest epoch (VERSION AS OF) — a pinned " +
            "epoch never changes; stream the current table instead")
        def positiveOpt(key: String): Option[Int] =
          Option(options.get(key)).map { v =>
            val n =
              try v.toInt
              catch {
                case _: NumberFormatException => throw new IllegalArgumentException(
                  s"$key must be a positive integer, got '$v'")
              }
            // zero/negative would freeze the stream silently (latestOffset
            // never advances) — loud beats hung
            require(n > 0, s"$key must be positive, got $n")
            n
          }
        new GraftEpochStream(SparkSession.active, baseDir, rel,
          underlying.dataSchema, readSchema,
          basePath = if (partitioned) Some(s"$baseDir/$rel") else None,
          maxEpochsPerTrigger = positiveOpt("maxEpochsPerTrigger"),
          maxFilesPerTrigger = positiveOpt("maxFilesPerTrigger"),
          startingEpoch = Option(options.get("startingEpoch")))
      },
      runtimeFilter = GraftCatalog.runtimeFilteredScan)

  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    !versionPinned && GraftCatalog.translate(predicates).isDefined

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    if (versionPinned) throw new UnsupportedOperationException(
      s"$name is pinned to a manifest epoch (VERSION AS OF) — epochs are " +
        "immutable; DELETE FROM the current table instead")
    val cond = GraftCatalog.translate(predicates).getOrElse(
      throw new UnsupportedOperationException(
        s"DELETE condition not translatable for $name " +
          s"(predicates: ${predicates.mkString(", ")}) — use the API face " +
          "(Store.deleteWhere) or the v1 registerCatalog SQL face"))
    new graft.io.Store(SparkSession.active, baseDir).deleteWhere(rel, cond)
    ()
  }
}

/** Driver-side metadata table (epoch history): a handful of rows by
  * construction, served through [[LocalScan]] — plans as a local table
  * scan, no distributed read.
  */
private[sql] class GraftHistoryTable(tableName: String, rows: Array[InternalRow])
    extends Table with SupportsRead {

  override def name(): String = tableName

  override def schema(): StructType = GraftHistoryTable.Schema

  override def partitioning(): Array[Transform] = Array.empty

  override def properties(): java.util.Map[String, String] =
    java.util.Collections.emptyMap()

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = GraftHistoryTable.Schema
        override def rows(): Array[InternalRow] = GraftHistoryTable.this.rows
      }
    }
}

private[sql] object GraftHistoryTable {
  val Schema: StructType = new StructType()
    .add("version", "bigint", nullable = false)
    .add("committed_at", TimestampType, nullable = false)
    .add("files", "int", nullable = false)
    .add("is_current", "boolean", nullable = false)
}

/** The `CALL`-able maintenance procedures ([[GraftCatalog.loadProcedure]]):
  * each binds a fixed IN-parameter list, runs the corresponding journaled
  * [[graft.io.Store]] operator on the active session, and returns its
  * stats as ONE driver-side row (a [[LocalScan]], like `$history`).
  * Deliberately NOT deterministic — a call is an action on table state.
  */
private[sql] object GraftProcedures {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  val Names: Seq[String] =
    Seq("vacuum", "optimize", "erosion", "maintain", "release_stale_claims")

  def load(catalog: String, base: String, name: String): UnboundProcedure =
    name match {
      case "vacuum" => new Vacuum(base)
      case "optimize" => new Optimize(base)
      case "erosion" => new Erosion(base)
      case "maintain" => new Maintain(base)
      case "release_stale_claims" => new Release(base)
      case other => throw notFound(s"$catalog.$other")
    }

  /** The Spark 4 not-found shape for procedures: an [[AnalysisException]]
    * under the ROUTINE_NOT_FOUND error class (4.1.2 has no dedicated
    * NoSuchProcedureException), so callers classifying errors see a
    * proper not-found instead of an internal error.
    */
  def notFound(name: String): org.apache.spark.sql.AnalysisException =
    new org.apache.spark.sql.AnalysisException(
      "ROUTINE_NOT_FOUND", Map("routineName" -> s"`$name`"), None)

  private def in(n: String, t: DataType) = ProcedureParameter.in(n, t).build()

  private def one(schema: StructType, row: InternalRow): java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(row)
    }).iterator()

  /** One fixed-signature procedure: unbound and bound in one object (the
    * parameter list never depends on the argument types).
    */
  private abstract class P(pname: String, desc: String,
                           params: Array[ProcedureParameter],
                           out: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = pname
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    protected def output: StructType = out
    protected def run(s: graft.io.Store, args: InternalRow): InternalRow
    final override def call(input: InternalRow): java.util.Iterator[Scan] =
      one(out, run(mkStore, input))
    protected def base: String
    private def mkStore = new graft.io.Store(SparkSession.active, base)
  }

  private class Vacuum(val base: String) extends P("vacuum",
    "reclaim all but the newest keep_last epochs (snapshots first, then unreferenced retired files)",
    Array(in("table", StringType), in("keep_last", IntegerType)),
    new StructType().add("kept_epochs", StringType).add("dropped_epochs", StringType)
      .add("removed_files", IntegerType).add("reclaimed_bytes", LongType)) {
    override def run(s: graft.io.Store, a: InternalRow): InternalRow = {
      val st = s.vacuum(a.getUTF8String(0).toString, a.getInt(1))
      InternalRow(UTF8String.fromString(st.keptEpochs.mkString(",")),
        UTF8String.fromString(st.droppedEpochs.mkString(",")),
        st.removedFiles, st.reclaimedBytes)
    }
  }

  private class Optimize(val base: String) extends P("optimize",
    "scoped recluster: rewrite only what appends eroded, untouched files never move",
    Array(in("table", StringType)),
    new StructType().add("kept_files", IntegerType).add("rewritten_files", IntegerType)
      .add("new_files", IntegerType).add("rewritten_bytes", LongType)
      .add("total_bytes", LongType)) {
    override def run(s: graft.io.Store, a: InternalRow): InternalRow = {
      val st = s.scopedRecluster(a.getUTF8String(0).toString)
      InternalRow(st.keptFiles, st.rewrittenFiles, st.newFiles,
        st.rewrittenBytes, st.totalBytes)
    }
  }

  private class Erosion(val base: String) extends P("erosion",
    "measure clustering erosion (expected files touched per narrow probe) without rewriting",
    Array(in("table", StringType)),
    new StructType().add("base_files", IntegerType).add("append_layers", IntegerType)
      .add("append_files", IntegerType).add("touched_per_probe", DoubleType)) {
    override def run(s: graft.io.Store, a: InternalRow): InternalRow = {
      val st = s.erosionStats(a.getUTF8String(0).toString)
      InternalRow(st.baseFiles, st.appendLayers, st.appendFiles, st.touchedPerProbe)
    }
  }

  private class Maintain(val base: String) extends P("maintain",
    "the measured daily cycle: scoped recluster (curve stores) or per-partition compaction (partitioned stores) past the erosion/file-count triggers, vacuum past the retired-bytes trigger",
    Array(in("table", StringType), in("max_touched_per_probe", DoubleType),
      in("max_append_files", IntegerType), in("max_retired_fraction", DoubleType),
      in("keep_last", IntegerType)),
    new StructType().add("reclustered", BooleanType).add("rewritten_files", IntegerType)
      .add("vacuumed", BooleanType).add("reclaimed_bytes", LongType)) {
    override def run(s: graft.io.Store, a: InternalRow): InternalRow = {
      val rel = a.getUTF8String(0).toString
      // layout-shaped routing: curve stores run the erosion-triggered
      // scoped recluster; managed PARTITIONED stores run the per-partition
      // small-file compaction (max_append_files doubles as the
      // files-per-partition cap — the same "too many small files" trigger
      // in both layouts; max_touched_per_probe has no partitioned analog)
      val (ran, rewritten) =
        if (s.isPartitionedStore(rel)) {
          val c = s.maintainPartitionsManaged(rel,
            maxFilesPerPartition = math.max(1, a.getInt(2)))
          (c.isDefined, c.map(_.filesIn).getOrElse(0))
        } else {
          val z = s.maintainZordered(rel, a.getDouble(1), Some(a.getInt(2)))
          (z.isDefined, z.map(_.rewrittenFiles).getOrElse(0))
        }
      val v = s.maintainRetention(rel, a.getDouble(3), a.getInt(4))
      InternalRow(ran, rewritten, v.isDefined,
        v.map(_.reclaimedBytes).getOrElse(0L))
    }
  }

  private class Release(val base: String) extends P("release_stale_claims",
    "admin release of a crashed writer's frontier claim and hidden staging debris (run only when no writer is live)",
    Array(in("table", StringType)),
    new StructType().add("released", IntegerType)) {
    override def run(s: graft.io.Store, a: InternalRow): InternalRow =
      InternalRow(s.releaseStaleClaims(a.getUTF8String(0).toString))
  }
}
