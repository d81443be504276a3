package org.apache.spark.sql.graftglue

import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.catalog.SupportsDelete
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.api.Manifest

/**
 * DataSource-V2 TableCatalog over the graft manifest store, so plain SQL can
 * address catalog tables natively:
 *
 *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftSqlCatalog].getName)
 *   spark.conf.set("spark.sql.catalog.graft.root", "/path/to/root")
 *   spark.sql("SELECT * FROM graft.bucket.schema.table WHERE ...")
 *
 * Reads resolve the table's CURRENT manifest and delegate scanning to
 * Spark's own ParquetTable (full pushdown/pruning/vectorization). Tables
 * carrying lazy per-file renames are served by [[RenameUnionTable]]
 * (per-rename-group parquet scans, unioned positionally), matching the
 * reference's transparent rename semantics. SQL INSERT appends through the
 * transactional manifest commit ([[GraftV1Writable]]); DDL and
 * namespace/table mutation stay API-only so manifests remain authoritative.
 */
class GraftSqlCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.root must point at the graft root dir"))
  }

  override def name(): String = catalogName

  private def tableDir(ident: Identifier) =
    Paths.get((root +: ident.namespace().toSeq :+ ident.name()).mkString("/"))

  /** DDL isolation: a `.pending` marker means an uncommitted transaction
    * created the table — invisible here exactly as through the API
    * (`Transaction.visibleTable`) until its commit removes the marker. */
  private def committed(tdir: java.nio.file.Path): Boolean =
    Files.isDirectory(tdir.resolve("_manifest")) &&
      !Files.exists(tdir.resolve("_manifest").resolve(".pending"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = Paths.get((root +: namespace.toSeq).mkString("/"))
    if (!Files.isDirectory(dir)) return Array.empty
    graft.api.Table.listDir(dir)
      .filter(committed)
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    committed(tableDir(ident))

  // --- SupportsNamespaces (read-only): buckets are top-level namespaces,
  //     nested schema dirs (".graft_schema"-marked) are sub-namespaces ---

  private def nsDir(namespace: Array[String]) =
    Paths.get((root +: namespace.toSeq).mkString("/"))

  override def listNamespaces(): Array[Array[String]] =
    graft.api.Table.listDir(Paths.get(root))
      .filter(p => Files.isDirectory(p) && !p.getFileName.toString.startsWith("_"))
      .map(p => Array(p.getFileName.toString))
      .toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = nsDir(namespace)
    if (!Files.isDirectory(dir)) Array.empty
    else graft.api.Table.listDir(dir)
      .filter(p => Files.exists(p.resolve(".graft_schema")))
      .map(p => namespace :+ p.getFileName.toString)
      .toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length match {
      case 0 => true
      case 1 => Files.isDirectory(nsDir(namespace)) // bucket
      case _ => Files.exists(nsDir(namespace).resolve(".graft_schema"))
    }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "writes go through the transactional graft API (createBucket/createSchema)")

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("use the transactional graft API")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("use the transactional graft API")

  override def loadTable(ident: Identifier): Table =
    loadAt(ident, graft.api.Table.currentVersion(tableDir(ident)), writable = true)

  /** SQL time travel: `VERSION AS OF n` resolves manifest v{n} — every
    * retained manifest version is addressable (snapshots are named aliases
    * over the same mechanism). Historical versions are read-only. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft versions are manifest numbers, got '$version'")
    }
    loadAt(ident, v, writable = false)
  }

  private def loadAt(ident: Identifier, version: Long, writable: Boolean): Table = {
    val dir = tableDir(ident)
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val mPath = dir.resolve("_manifest").resolve(f"v$version%08d.json")
    if (!Files.exists(mPath))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val m = Manifest.read(mPath)
    val schema = StructType(m.schema.fields :+
      StructField("_row_id", LongType, nullable = false))
    // manifests store table-dir-relative data paths (so staged renames can
    // move the dir atomically); Table.resolvePath is the shared resolver —
    // it also redirects snapshot manifest trees to the original data dirs
    if (m.files.exists(_.renames.nonEmpty)) {
      // rename-evolved: per-rename-group parquet scans unioned positionally
      val groups = m.files.groupBy(_.renames).toSeq.map { case (ren, fs) =>
        (ren, fs.map(f => graft.api.Table.resolvePath(dir, f.path)))
      }
      if (writable)
        new RenameUnionTable(ident.toString, schema, groups)
          with GraftV1Writable { val writeRoot = root; val writeIdent = ident }
      else new RenameUnionTable(ident.toString, schema, groups)
    } else {
      val paths = m.files.map(f => graft.api.Table.resolvePath(dir, f.path)).toList
      val fresh = m.projections.filterNot(_.stale).map(p =>
        (p.columns.toSet + "_row_id", p.sortedColumns.headOption,
          graft.api.Table.resolvePath(dir, p.dir)))
      if (fresh.nonEmpty) {
        // covered scans route to a materialized projection, like the picker
        // in Table.select (and the reference server's transparent selection)
        if (writable)
          new ProjectionRoutingTable(ident.toString, schema, paths, fresh)
            with GraftV1Writable { val writeRoot = root; val writeIdent = ident }
        else new ProjectionRoutingTable(ident.toString, schema, paths, fresh)
      } else {
        val parquet = ParquetTable(ident.toString, SparkSession.active,
          CaseInsensitiveStringMap.empty(), paths, Some(schema),
          classOf[ParquetFileFormat])
        if (writable)
          new ReadOnlyTable(parquet)
            with GraftV1Writable { val writeRoot = root; val writeIdent = ident }
        else new ReadOnlyTable(parquet)
      }
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "writes go through the transactional graft API (manifest-versioned)")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("use the transactional graft API")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("use the transactional graft API")

  override def renameTable(old: Identifier, next: Identifier): Unit =
    throw new UnsupportedOperationException("use the transactional graft API")
}

/** Scan delegate: BATCH_READ from the wrapped file table (write capability
  * mixed in via [[GraftV1Writable]] at loadTable). */
private[graftglue] class ReadOnlyTable(delegate: ParquetTable)
    extends Table with SupportsRead {
  override def name(): String = delegate.name
  override def schema(): StructType = delegate.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    delegate.newScanBuilder(options)
}

/**
 * SQL INSERT routed through the transactional manifest commit: Spark's V1
 * write bridge hands the materialized insert DataFrame to the driver, where
 * `Table.insert` performs the DISTRIBUTED parquet write and the transaction's
 * manifest CAS publishes it atomically — concurrent SQL inserts against the
 * same table version conflict exactly like API inserts (one wins, one gets
 * `Conflict`). Append-only; the exposed schema includes `_row_id`, so an
 * INSERT must supply explicit row ids (the reference's external
 * `vastdb_rowid` path) or insert through the API, which allocates them.
 */
private[graftglue] trait GraftV1Writable extends Table with SupportsWrite
    with SupportsDelete {
  def writeRoot: String
  def writeIdent: Identifier

  private def inTx[T](body: graft.api.Table => T): T = {
    val ns = writeIdent.namespace()
    val vs = graft.api.VastSession(SparkSession.active, writeRoot)
    vs.transaction(tx => body(
      tx.bucket(ns.head).schema(ns.tail.mkString("/")).table(writeIdent.name())))
  }

  /** V1 Filter -> Column; None marks a filter this surface can't express
    * (canDeleteWhere then rejects the whole DELETE, per the DSv2 contract). */
  private def filterToColumn(f: org.apache.spark.sql.sources.Filter)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit, not}
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
      case StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case StringContains(a, v) => Some(col(a).contains(v))
      case And(l, r) =>
        for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
      case Or(l, r) =>
        for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
      case Not(c) => filterToColumn(c).map(not)
      case AlwaysTrue() => Some(lit(true))
      case AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }

  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter])
      : Boolean = filters.forall(f => filterToColumn(f).isDefined)

  /** SQL DELETE WHERE through the same transactional COW path as the API:
    * victims resolved by `_row_id` under the predicate, file-pruned rewrite,
    * manifest CAS publish. */
  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.functions.lit
    val pred = filters.flatMap(filterToColumn)
      .foldLeft(lit(true))(_ && _)
    inTx { t =>
      val victims = t.select(Nil, pred, internalRowId = true).select("_row_id")
      t.delete(victims)
    }
  }

  abstract override def capabilities(): util.Set[TableCapability] = {
    val caps = util.EnumSet.copyOf(super.capabilities())
    caps.add(TableCapability.V1_BATCH_WRITE)
    caps
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data: org.apache.spark.sql.DataFrame, overwrite: Boolean) => {
            if (overwrite) throw new UnsupportedOperationException(
              "overwrite not supported; data files are immutable (use DML)")
            inTx(_.insert(data))
            ()
          }
      }
    }
}
