package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/**
 * Durable catalog-backed [[graft.llm.Curation.StageStore]] — the
 * corpus-scale stage boundary for [[graft.llm.Curation.curateCorpus]]:
 * each stage output lands in a graft table `{prefix}_stage_{stageName}`
 * inside `schema`, so it
 *
 *  - survives executor loss (unlike executor-local checkpoints, which
 *    hold a corpus copy in executor storage and die with the executor),
 *  - is independently queryable and TIME-TRAVELABLE afterwards (each
 *    re-run is a new manifest version — `selectAt` reaches any prior
 *    curation run's intermediate state), and
 *  - yields the row accounting for free: the insert/overwrite returns the
 *    allocated row-id range `[start, end)`, so the stage count is
 *    `end - start` with NO second corpus pass.
 *
 * Re-runs OVERWRITE each stage table in place (the same transactional
 * step as SQL `INSERT OVERWRITE`); an existing table with a DIFFERENT
 * schema is refused rather than silently replaced — it isn't this run's
 * stage output. All writes stage inside the surrounding transaction and
 * become visible at its commit (reads within the transaction see the
 * staged manifest, so downstream stages consume the just-written data).
 */
class CatalogStageStore(schema: SchemaNS, prefix: String)
    extends graft.llm.Curation.StageStore {

  /** The table name stage `name` materializes into. */
  def stageTableName(name: String): String = s"${prefix}_stage_$name"

  override def materialize(name: String, dfIn: DataFrame): (DataFrame, Long) = {
    val tname = stageTableName(name)
    // strip a carried $row_id: the verbatim-id insert path would return a
    // GAPPY id range for a filtered frame (end - start overstating the
    // stage count), and stage tables should mint their own ids anyway
    val df = dfIn.drop(graft.types.TypeMapping.RowIdColumn)
    def shape(s: StructType) = s.fields
      .filterNot(_.name == graft.types.TypeMapping.RowIdColumn)
      .map(f => (f.name, f.dataType)).toSeq
    val (start, end) = schema.tableOption(tname) match {
      case Some(t) =>
        if (shape(t.manifest.schema) != shape(df.schema))
          throw new IllegalArgumentException(
            s"stage table '${schema.path}/$tname' exists with a different " +
              "schema — DROP it or curate with another prefix")
        t.overwrite(df)
      case None =>
        schema.createTable(tname, df.schema).insert(df)
    }
    (schema.table(tname).select(), end - start)
  }
}
