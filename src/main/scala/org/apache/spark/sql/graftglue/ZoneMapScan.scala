package org.apache.spark.sql.graftglue

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder,
  SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * SQL-read-path table with manifest zone-map FILE pruning: the scan builder
 * intercepts pushed filters, drops whole files whose per-column min/max
 * envelopes cannot match (`graft.api.Table.pruneByZoneMaps` — the same
 * pruning the API scan applies in `Table.select`), and only then hands off
 * to Spark's own parquet builder over the kept paths. Parquet row-group
 * pruning still happens INSIDE each kept file (filters are forwarded
 * verbatim), so this adds the layer parquet cannot provide at 100 TB: not
 * opening — not even for a footer read — the files the manifest already
 * proves empty for the predicate. On a z-ordered or sorted table a
 * selective SELECT through the SQL catalog then touches a handful of files
 * out of thousands, with zero extra I/O spent deciding so.
 *
 * Only used on rename-free manifests (zone-map stats are generation-local
 * under lazy renames; `loadAt` routes rename-evolved tables elsewhere).
 */
private[graftglue] class ZoneMapTable(
    tableName: String, tableSchema: StructType, tdir: java.nio.file.Path,
    entries: Seq[graft.api.Manifest.FileEntry])
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZoneMapScanBuilder(tableName, tableSchema, tdir, entries, options)
}

/**
 * Push-down order is fixed by `V2ScanRelationPushDown` (filters →
 * aggregates → columns → build), so the inner parquet builder is created
 * lazily at first use: by then the filter step has either run (and shrunk
 * the file list) or was skipped (no filters — nothing to prune).
 */
private[graftglue] class ZoneMapScanBuilder(
    tableName: String, tableSchema: StructType, tdir: java.nio.file.Path,
    entries: Seq[graft.api.Manifest.FileEntry],
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var kept = entries
  private var inner: ParquetScanBuilder = _

  private def innerB: ParquetScanBuilder = {
    if (inner == null) {
      val paths = kept.map(f =>
        graft.api.Table.resolvePath(tdir, f.path)).toList
      inner = ParquetTable(tableName, SparkSession.active,
          CaseInsensitiveStringMap.empty(), paths, Some(tableSchema),
          classOf[ParquetFileFormat])
        .newScanBuilder(options).asInstanceOf[ParquetScanBuilder]
    }
    inner
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    if (inner == null) {
      // file pruning is keep-conservative: untranslatable filters prune
      // nothing, and matching semantics stay entirely with Spark — the
      // forwarded filters (and the post-scan residual Spark keeps) are
      // evaluated over the kept files exactly as without this layer
      val cond = filters
        .flatMap(e => DataSourceStrategy.translateFilter(
          e, supportNestedPredicatePushdown = true))
        .flatMap(GraftFilters.filterToColumn)
        .reduceOption(_ && _)
      cond.foreach(c => kept = graft.api.Table.pruneByZoneMaps(kept, c))
    }
    innerB.pushFilters(filters)
  }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    innerB.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    innerB.pruneColumns(requiredSchema)

  override def pushAggregation(aggregation: Aggregation): Boolean =
    innerB.pushAggregation(aggregation)

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    innerB.supportCompletePushDown(aggregation)

  override def build(): Scan = innerB.build()
}
