package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.api.Manifest

/**
 * Structured Streaming source over a graft table: the manifest version chain
 * IS the changelog, so `spark.readStream.format("graft").load(tableDir)`
 * turns a catalog table into an incremental feed — each micro-batch reads
 * exactly the data files ADDED between two manifest versions (offsets are
 * version numbers; immutable files make the delta a set difference of path
 * lists, no file-level diffing or listing).
 *
 * This is the 100 TB ingest shape: a continuously-loaded corpus table feeds
 * downstream curation/dedup/analysis pipelines incrementally — each trigger
 * processes only the newly committed files, never rescans the corpus, and
 * restart resumes from the checkpointed version.
 *
 * Semantics: APPEND-ONLY changefeed. A version that REMOVES files (COW
 * update/delete, compaction) fails the stream with a clear error by default
 * — replaying a rewritten file would re-deliver carried-over rows — unless
 * `ignoreChanges=true`, which emits the rewritten files (documented
 * at-least-once for rows in rewritten groups, the standard trade). Streaming
 * across a column rename requires `optimizeSort`/rewrite first: delta files
 * carrying rename maps are rejected (their physical schema diverged).
 *
 * Batch reads through this provider serve the CURRENT manifest's files —
 * `spark.read.format("graft").load(dir)` — with Spark's own parquet scan.
 */
class GraftStreamSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def tableDir(options: CaseInsensitiveStringMap): Path = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft source needs .load(<table dir>)"))
    Paths.get(p)
  }

  private def currentManifest(dir: Path): Manifest.TableManifest = {
    val v = graft.api.Table.currentVersion(dir)
    Manifest.read(dir.resolve("_manifest").resolve(f"v$v%08d.json"))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(currentManifest(tableDir(options)).schema.fields :+
      StructField("_row_id", LongType, nullable = false))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftStreamTable(tableDir(opts), schema,
      opts.getBoolean("ignoreChanges", false))
  }
}

private class GraftStreamTable(dir: Path, tableSchema: StructType,
                               tableIgnoreChanges: Boolean)
    extends Table with SupportsRead {

  override def name(): String = s"graft-stream:$dir"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = tableSchema
      override def pruneColumns(s: StructType): Unit =
        if (s.nonEmpty) required = s
      override def build(): Scan = new GraftStreamScan(dir, required,
        // reader options surface here on every query (re)start; the
        // getTable-time flag is the fallback for resolution paths that
        // don't carry options into the scan
        tableIgnoreChanges || options.getBoolean("ignoreChanges", false),
        options.getInt("maxFilesPerTrigger", Int.MaxValue),
        Option(options.get("startingVersion")))
    }
}

private class GraftStreamScan(dir: Path, required: StructType,
                              ignoreChanges: Boolean,
                              maxFilesPerTrigger: Int,
                              startingVersion: Option[String]) extends Scan {
  override def readSchema(): StructType = required
  override def description(): String = s"graft version-delta scan of $dir"

  private def manifestAt(v: Long): Manifest.TableManifest = {
    val p = dir.resolve("_manifest").resolve(f"v$v%08d.json")
    if (!Files.exists(p)) throw new IllegalStateException(
      s"graft stream offset v$v no longer exists under $dir — the manifest " +
        "was vacuumed; restart the stream from a fresh checkpoint")
    Manifest.read(p)
  }

  private def parquetBatch(paths: Seq[String]): Batch =
    ParquetTable(s"graft-stream:$dir", SparkSession.active,
      CaseInsensitiveStringMap.empty(), paths.toList, Some(required),
      classOf[ParquetFileFormat])
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build().toBatch

  /** Batch path: the CURRENT manifest's full file set. Rename-evolved
    * tables are rejected — their files need per-group physical→logical
    * mapping (and drop tombstones must not resurrect), which the SQL
    * catalog's RenameUnionTable provides; a raw parquet read here would
    * silently null renamed columns. */
  override def toBatch: Batch = {
    val m = manifestAt(graft.api.Table.currentVersion(dir))
    if (m.files.exists(_.renames.nonEmpty))
      throw new IllegalStateException(
        s"graft batch read of $dir: table carries column-rename maps; " +
          "read it through the graft SQL catalog (which maps per-file " +
          "physical names) instead of format(\"graft\")")
    parquetBatch(m.files.map(f => graft.api.Table.resolvePath(dir, f.path)))
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream with SupportsAdmissionControl
        with SupportsTriggerAvailableNow {
      // Trigger.AvailableNow: pin the drain target at query start so the
      // paced batches stop at a stable version even while writers commit
      @volatile private var availableNowTarget: Option[Long] = None
      override def prepareForTriggerAvailableNow(): Unit =
        availableNowTarget = Some(graft.api.Table.currentVersion(dir))
      private def targetVersion: Long =
        availableNowTarget.getOrElse(graft.api.Table.currentVersion(dir))

      /** Where a FRESH stream (no checkpoint) begins: "earliest" (default)
        * replays the whole table as the first batch, "latest" starts at the
        * current version (new commits only), a number starts AFTER that
        * version — the reprocess-vs-tail choice every changefeed consumer
        * needs. Checkpointed restarts never consult this. */
      override def initialOffset(): Offset = GraftVersionOffset(
        startingVersion match {
          case None | Some("earliest") => 0L
          case Some("latest") => graft.api.Table.currentVersion(dir)
          case Some(v) =>
            val n = try v.toLong catch {
              case _: NumberFormatException => throw new IllegalArgumentException(
                s"startingVersion must be earliest|latest|<version>, got '$v'")
            }
            val cur = graft.api.Table.currentVersion(dir)
            // fail fast: past-the-end silently behaving as "latest" would
            // hide a typo'd version (or the wrong table) forever
            if (n > cur) throw new IllegalArgumentException(
              s"startingVersion $n is beyond the table's current version $cur")
            n
        })
      override def latestOffset(): Offset = GraftVersionOffset(targetVersion)
      override def deserializeOffset(json: String): Offset =
        GraftVersionOffset(json.trim.toLong)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()

      /** Backlog rate limiting (`maxFilesPerTrigger`): instead of draining
        * an arbitrarily deep version backlog in one giant batch, advance to
        * the FURTHEST version whose cumulative new-file count stays within
        * the cap (always ≥ one version, so progress is guaranteed even past
        * an oversized commit). Versions are walked forward from the current
        * offset — cost proportional to the backlog being admitted, not to
        * table history. */
      override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
        val cur = targetVersion
        val s = start.asInstanceOf[GraftVersionOffset].version
        if (maxFilesPerTrigger == Int.MaxValue || cur <= s)
          return GraftVersionOffset(cur)
        var known: Set[String] =
          if (s == 0) Set.empty else manifestAt(s).files.map(_.path).toSet
        var admitted = s
        var budget = maxFilesPerTrigger
        var v = s + 1
        var stop = false
        while (!stop && v <= cur) {
          val files = manifestAt(v).files.map(_.path).toSet
          val fresh = (files -- known).size
          if (fresh <= budget || admitted == s) { // always admit ≥ 1 version
            admitted = v
            budget -= fresh
            known = files
            v += 1
            if (budget <= 0) stop = true
          } else stop = true
        }
        GraftVersionOffset(admitted)
      }

      override def getDefaultReadLimit: ReadLimit =
        if (maxFilesPerTrigger == Int.MaxValue) ReadLimit.allAvailable()
        else ReadLimit.maxFiles(maxFilesPerTrigger)

      override def planInputPartitions(start: Offset, end: Offset)
          : Array[InputPartition] = {
        val s = start.asInstanceOf[GraftVersionOffset].version
        val e = end.asInstanceOf[GraftVersionOffset].version
        if (e <= s) return Array.empty
        val startPaths: Set[String] =
          if (s == 0) Set.empty else manifestAt(s).files.map(_.path).toSet
        val endM = manifestAt(e)
        val endPaths = endM.files.map(_.path).toSet
        val removed = startPaths -- endPaths
        if (removed.nonEmpty && !ignoreChanges)
          throw new IllegalStateException(
            s"graft stream: versions v$s..v$e of $dir removed ${removed.size} " +
              "file(s) (COW update/delete or compaction) — this feed is " +
              "append-only. Set ignoreChanges=true to emit rewritten files " +
              "(at-least-once for rows in rewritten groups)")
        val newFiles = endM.files.filterNot(f => startPaths(f.path))
        // column DDL mid-stream: files written AFTER a rename carry the new
        // physical names (no rename map), so a raw read against this query's
        // pinned schema would silently null the renamed column. Catch both
        // shapes: files with rename maps, and an end-version schema that no
        // longer covers the columns this stream was started with.
        if (newFiles.exists(_.renames.nonEmpty))
          throw new IllegalStateException(
            "graft stream: delta files carry column-rename maps; restart the " +
              "stream to pick up the evolved schema")
        val missing = required.fieldNames.filterNot(n =>
          n == "_row_id" || endM.schema.fieldNames.contains(n))
        if (missing.nonEmpty)
          throw new IllegalStateException(
            s"graft stream: column(s) ${missing.mkString(", ")} no longer " +
              s"exist at version v$e (renamed or dropped mid-stream); " +
              "restart the stream against the current schema")
        if (newFiles.isEmpty) Array.empty
        else parquetBatch(newFiles.map(f =>
          graft.api.Table.resolvePath(dir, f.path))).planInputPartitions()
      }

      /** Factory from a path-less template scan: parquet reader factories
        * close over schema/conf only — the planned partitions carry the
        * actual file splits, so one factory serves every micro-batch. */
      override def createReaderFactory(): PartitionReaderFactory =
        parquetBatch(Nil).createReaderFactory()
    }
}

/** Stream offset = manifest version (total-ordered by the commit CAS). */
private[sources] case class GraftVersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}
