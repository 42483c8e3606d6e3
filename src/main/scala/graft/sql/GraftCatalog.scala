package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCapability, TableCatalog, TableChange, SupportsRead}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
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
  * directory listings of metadata — O(files), no data pages.
  *
  * Identifiers map to store paths: `graft.a.b.t` -> `<base>/a/b/t`
  * (namespace segments are subdirectories). The catalog is READ-ONLY by
  * construction — the only write paths to a manifest-tracked table are
  * the journaled Store mutators; exposing v2 writes here would bypass
  * the epoch CAS and the retire discipline, so the table advertises
  * BATCH_READ alone and every DDL/DML entry point fails loudly.
  *
  * Failure modes mirror the API face: a vacuumed or never-committed
  * `VERSION AS OF` epoch and a manifest-less directory stay loud
  * ([[graft.io.Store.readVersion]]'s messages); a nonexistent path is
  * the analyzer's ordinary TABLE_OR_VIEW_NOT_FOUND.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var base: String = _

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
        fs.exists(graft.io.LayoutManifest.path(st.getPath)))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <epoch>` — the SQL face of [[graft.io.Store.readVersion]]. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val epoch =
      try version.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft time travel takes a manifest EPOCH number, got '$version' " +
            s"(available: listVersions on the store)")
      }
    load(ident, Some(epoch))
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
    val paths = epoch match {
      case Some(e) => store.resolveVersionPaths(rel, e)
      case None => store.resolveSnapshotPaths(rel)
    }
    new GraftTable(ParquetTable(s"$catalogName.$rel", spark,
      CaseInsensitiveStringMap.empty(), paths, None, classOf[ParquetFileFormat]))
  }

  private def readOnly(op: String): Nothing = throw new UnsupportedOperationException(
    s"graft catalog '$catalogName' is read-only ($op): mutate through the journaled " +
      "Store operators (writeZordered/appendZordered/deleteWhere/updateWhere/...), " +
      "which hold the epoch CAS and retire replaced files for time travel")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table =
    readOnly("CREATE TABLE")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}

/** Read-only wrapper over Spark's v2 [[ParquetTable]]: same schema, same
  * scan builder (full pushdown/pruning), but ONLY the BATCH_READ
  * capability — `INSERT INTO graft.t` must fail at analysis rather than
  * write unjournaled files into a manifest-tracked directory.
  */
private[sql] class GraftTable(underlying: ParquetTable) extends Table with SupportsRead {

  override def name(): String = underlying.name

  override def schema(): StructType = underlying.schema

  override def partitioning(): Array[Transform] = underlying.partitioning

  override def properties(): java.util.Map[String, String] = underlying.properties

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    underlying.newScanBuilder(options)
}
