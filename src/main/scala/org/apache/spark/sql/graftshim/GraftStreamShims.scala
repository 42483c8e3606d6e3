package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsReportStatistics, Statistics}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.execution.datasources.v2.FileScan
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.{SupportsMetadata, SupportsPushDownCatalystFilters}
import org.apache.spark.sql.types.StructType

/** Package-access shims for the graft DSv2 streaming face (the sibling of
  * [[org.apache.spark.sql.GraftBridge]]): `SupportsPushDownCatalystFilters`
  * and `SupportsMetadata` are `private[sql]`, so the delegating wrappers
  * that preserve the stock parquet pushdown while adding a
  * `toMicroBatchStream` live here — thin, original delegation only.
  *
  * Why a wrapper at all: `spark.readStream.table("graft.t")` drives the
  * SAME `newScanBuilder` as batch reads, and the stock `ParquetScan`'s
  * `toMicroBatchStream` throws. Wrapping the built scan keeps every batch
  * property the specs pin — column pruning and catalyst filter pushdown
  * (builder delegation), the `PushedFilters` plan display
  * (`SupportsMetadata.getMetaData`), statistics, columnar reads — and
  * routes only the streaming entry point to the epoch-changelog stream
  * the caller supplies.
  */
/** `private[sql]` forwarding for the v2 DELETE face's predicate
  * translation (same role as [[org.apache.spark.sql.GraftBridge]]).
  */
object GraftShim {
  def predicateToV1(p: Predicate): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(p)
}

class GraftStreamingScanBuilder(underlying: ParquetScanBuilder,
                                mkStream: (StructType, String) => MicroBatchStream,
                                runtimeFilter: (FileScan, Array[Predicate]) => Option[FileScan] =
                                  (_, _) => None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownVariantExtractions {

  override def pruneColumns(requiredSchema: StructType): Unit =
    underlying.pruneColumns(requiredSchema)

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    underlying.pushFilters(filters)

  override def pushedFilters: Array[Predicate] = underlying.pushedFilters

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    underlying.pushAggregation(agg)

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    underlying.supportCompletePushDown(agg)

  override def pushVariantExtractions(
      extractions: Array[org.apache.spark.sql.connector.read.VariantExtraction]): Array[Boolean] =
    underlying.pushVariantExtractions(extractions)

  override def build(): Scan =
    new GraftStreamingScan(underlying.build().asInstanceOf[FileScan], mkStream,
      runtimeFilter)
}

/** Delegates every batch face of the wrapped [[FileScan]]; streaming goes
  * to the epoch stream. Implements [[SupportsRuntimeV2Filtering]] — a
  * capability stock v2 parquet LACKS: dynamic partition pruning hands the
  * join-time predicates to [[filter]], which re-plans the wrapped scan
  * over only the matching partitions' files (the `runtimeFilter` callback
  * owns the translation; a non-translatable predicate leaves the scan
  * unchanged — pruning is an optimization, never a correctness gate).
  * `underlying` is mutable for exactly this protocol: BatchScanExec calls
  * filter() and then re-invokes toBatch for the filtered partitions.
  */
class GraftStreamingScan(private var underlying: FileScan,
                         mkStream: (StructType, String) => MicroBatchStream,
                         runtimeFilter: (FileScan, Array[Predicate]) => Option[FileScan] =
                           (_, _) => None)
    extends Scan with SupportsReportStatistics with SupportsMetadata
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    underlying.fileIndex.partitionSchema.fieldNames.map(n =>
      org.apache.spark.sql.connector.expressions.FieldReference.column(n))

  override def filter(predicates: Array[Predicate]): Unit =
    runtimeFilter(underlying, predicates).foreach(s => underlying = s)

  override def readSchema(): StructType = underlying.readSchema()

  override def toBatch: Batch = underlying.toBatch

  override def description(): String = underlying.description()

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    underlying.columnarSupportMode()

  override def supportedCustomMetrics() = underlying.supportedCustomMetrics()

  override def reportDriverMetrics() = underlying.reportDriverMetrics()

  override def estimateStatistics(): Statistics = underlying.estimateStatistics()

  override def getMetaData(): Map[String, String] = underlying.getMetaData()

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    mkStream(underlying.readSchema(), checkpointLocation)

  // scan equality drives ReuseExchange/ReuseSubquery: two references to
  // the same graft table in one query must compare equal (the wrapped
  // ParquetScan is a case class and carries the real identity)
  override def equals(other: Any): Boolean = other match {
    case o: GraftStreamingScan => underlying == o.underlying
    case _ => false
  }

  override def hashCode(): Int = underlying.hashCode()
}
