package graft.api

/**
 * Engine capability flags (reference: server-version feature gates,
 * vastdb/features.py:18-52 — e.g. check_imports_table, check_return_row_ids,
 * check_enforce_semisorted_projection). The reference gates client behavior
 * on the server version it talks to; here the "server" is the engine build,
 * so gates are compile-time truths — but the check API is preserved so
 * callers written against the reference's shape keep working.
 */
final case class Features(version: String = "1.0.0") {
  val checkImportsTable: Boolean = true
  val checkReturnRowIds: Boolean = true
  val checkEnforceSemisortedProjection: Boolean = true
  val checkExternalRowIdsAllocation: Boolean = true
  val checkElysiumTables: Boolean = true
  val checkVectorIndexes: Boolean = true
  val checkBlobExpansion: Boolean = true
  val checkTimestampTimezones: Boolean = true

  def require(flag: Boolean, name: String): Unit =
    if (!flag) throw NotSupportedCommand(s"feature not supported: $name")
}
