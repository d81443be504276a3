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
}
