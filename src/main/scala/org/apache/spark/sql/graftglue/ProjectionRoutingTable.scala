package org.apache.spark.sql.graftglue

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * DSv2 table that routes covered scans to a materialized semi-sorted
 * projection — the SQL-surface analog of `Table.select`'s picker, mirroring
 * the reference server's transparent projection selection
 * (/root/reference/vastdb/tests/test_projections.py:102-125). The decision
 * happens at `build()`, after Spark has pushed the required columns and
 * filters: if a FRESH projection's column set covers everything the scan
 * needs, its (column-subset, sorted) files are scanned instead of the base
 * table — fewer bytes and better row-group locality; otherwise the base
 * files serve. Projections hold the same rows as the base (stale ones are
 * excluded upstream), so routing never changes results. All filters remain
 * post-scan residuals either way.
 */
private[graftglue] class ProjectionRoutingTable(
    tableName: String,
    logicalSchema: StructType,
    basePaths: Seq[String],
    // (projection columns incl. _row_id, leading sort column, resolved data
    // dir), fresh only
    projections: Seq[(Set[String], Option[String], String)],
    // fresh ROLLUPS for AggProjectionRewrite: a table can carry both kinds
    // of materialization, scans route to one, aggregates to the other
    val aggRollups: Seq[(graft.api.Manifest.AggProjectionMeta, String)] = Nil)
    extends Table with SupportsRead with HasAggRollups {

  override def name(): String = tableName
  override def schema(): StructType = logicalSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns
        with SupportsPushDownCatalystFilters {
      private var required: StructType = logicalSchema
      private var filters: Seq[Expression] = Nil

      override def pruneColumns(s: StructType): Unit =
        if (s.nonEmpty) required = s

      override def pushFilters(fs: Seq[Expression]): Seq[Expression] = {
        filters = fs
        fs // all residual: pushdown is a pruning hint, never load-bearing
      }
      override def pushedFilters
          : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
        Array.empty

      override def build(): Scan = {
        val needed = required.fieldNames.toSet
        // same preference as Table.pickProjection: among covering candidates,
        // one whose LEADING sort column appears in the pushed filters wins
        // (its row-group locality is what the filters can exploit)
        val filterRefs = filters.flatMap(_.references.map(_.name)).toSet
        val covering = projections.filter(_._1.superset(needed))
        val paths = covering.find(_._2.exists(filterRefs))
          .orElse(covering.headOption) match {
          case Some((_, _, pdir)) => Seq(pdir)
          case None => basePaths
        }
        val pt = ParquetTable(tableName, SparkSession.active,
          CaseInsensitiveStringMap.empty(), paths.toList, Some(required),
          classOf[ParquetFileFormat])
        val sb = pt.newScanBuilder(CaseInsensitiveStringMap.empty())
        sb match {
          case f: SupportsPushDownCatalystFilters => f.pushFilters(filters)
          case _ => ()
        }
        sb.build()
      }
    }

  private implicit class SetOps(s: Set[String]) {
    def superset(o: Set[String]): Boolean = o.subsetOf(s)
  }
}
