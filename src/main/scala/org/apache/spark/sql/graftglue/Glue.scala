package org.apache.spark.sql.graftglue

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into `private[sql]` Spark internals (Column ↔ Catalyst Expression,
 * function registry). Lives under org.apache.spark.sql so the `private[sql]`
 * members are visible — the standard technique for third-party Catalyst
 * extensions; nothing here touches non-public *behavior*, only accessors.
 */
object Glue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def registry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry

  /** Fully convert a Column to a catalyst expression tree (the lazy
    * `expression` wrapper defers conversion, hiding the node structure). */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** A clone of `spark` sharing the SparkContext, catalog state, and runtime
    * conf values, but with an independent SQLConf: scan-scoped knobs (e.g.
    * `spark.sql.files.maxPartitionBytes`) set on the clone are consulted at
    * plan time of DataFrames built from it, and never leak into the parent
    * session. (A save/restore around the read would not work — file-partition
    * sizing is read lazily when the query is planned, not when the
    * DataFrame is constructed.) */
  def scopedSession(spark: SparkSession, confs: Map[String, String]): SparkSession = {
    val clone = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
    confs.foreach { case (k, v) => clone.conf.set(k, v) }
    clone
  }

  /** True iff the column is the literal TRUE (the no-op predicate). */
  def isLiteralTrue(c: Column): Boolean = catalystExpression(c) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(true, _) => true
    case _ => false
  }

  /** Root column names referenced by a (possibly unresolved) Column. */
  def referencedRoots(c: Column): Set[String] =
    catalystExpression(c).collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.nameParts.head
    }.toSet

  /** Top-level-AND range constraints (column, op, literal-value) from an
    * unresolved predicate Column. Comparisons appear as unresolved function
    * calls pre-analysis; foldable non-attribute sides (literals, casted
    * literals) are evaluated here. */
  def rangeConstraints(c: Column): Seq[(String, String, Any)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions._
    val ops = Set(">", ">=", "<", "<=", "=", "==")
    def attrOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 => Some(a.nameParts.head)
      case _ => None
    }
    def litOf(e: Expression): Option[Any] = e match {
      case l: Literal => Option(l.value)
      case other =>
        // resolve foldable subtrees (e.g. cast('2024-01-01' as timestamp))
        try {
          if (other.resolved && other.foldable) Option(other.eval())
          else other match {
            case c0: Cast if c0.child.isInstanceOf[Literal] =>
              val r = c0.withTimeZone("UTC") // session tz is pinned UTC
              if (r.resolved) Option(r.eval()) else None
            case _ => None
          }
        } catch { case _: Exception => None }
    }
    def flip(op: String) = op match {
      case ">" => "<"; case ">=" => "<="; case "<" => ">"; case "<=" => ">="
      case o => o
    }
    def norm(op: String) = if (op == "==") "=" else op
    def cmp(op: String, l: Expression, r: Expression): Seq[(String, String, Any)] =
      (attrOf(l), litOf(r), attrOf(r), litOf(l)) match {
        case (Some(a), Some(v), _, _) => Seq((a, norm(op), v))
        case (_, _, Some(a), Some(v)) => Seq((a, flip(norm(op)), v))
        case _ => Nil
      }
    def walk(e: Expression): Seq[(String, String, Any)] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case f: UnresolvedFunction
          if f.nameParts.lastOption.contains("and") && f.arguments.size == 2 =>
        walk(f.arguments(0)) ++ walk(f.arguments(1))
      case f: UnresolvedFunction
          if f.nameParts.lastOption.exists(ops) && f.arguments.size == 2 =>
        cmp(f.nameParts.last, f.arguments(0), f.arguments(1))
      case GreaterThan(l, r) => cmp(">", l, r)
      case GreaterThanOrEqual(l, r) => cmp(">=", l, r)
      case LessThan(l, r) => cmp("<", l, r)
      case LessThanOrEqual(l, r) => cmp("<=", l, r)
      case EqualTo(l, r) => cmp("=", l, r)
      case _ => Nil
    }
    walk(catalystExpression(c))
  }
}
