package graft.api

/**
 * Typed error taxonomy (reference: vastdb/errors.py:219-519 maps HTTP codes
 * to a typed hierarchy). Here errors are local conditions, so the hierarchy
 * keeps the *names and semantics* users rely on, minus the transport layer:
 *  - Missing* / Exists — catalog lookups (404 / 409-exists analogs)
 *  - Conflict — optimistic-commit collision (reference: tx commit 409)
 *  - MissingRowIdColumn — DML batch without `_row_id` (errors.py:121)
 *  - NotSupportedSchema / NotSupportedCommand — validation rejections
 */
sealed abstract class GraftException(msg: String) extends RuntimeException(msg)

final case class MissingBucket(name: String)
  extends GraftException(s"bucket not found: $name")
final case class MissingSchema(name: String)
  extends GraftException(s"schema not found: $name")
final case class MissingTable(name: String)
  extends GraftException(s"table not found: $name")
final case class MissingSnapshot(name: String)
  extends GraftException(s"snapshot not found: $name")
final case class SchemaExists(name: String)
  extends GraftException(s"schema already exists: $name")
final case class TableExists(name: String)
  extends GraftException(s"table already exists: $name")
final case class Conflict(msg: String) extends GraftException(msg)
final case class MissingRowIdColumn(msg: String = "_row_id column required")
  extends GraftException(msg)
final case class NotSupportedSchema(msg: String) extends GraftException(msg)
final case class NotSupportedCommand(msg: String) extends GraftException(msg)
final case class TransactionInactive(msg: String = "transaction is not active")
  extends GraftException(msg)
