package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's package-private Column⇄Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils) — needed to wrap custom
  * Catalyst expressions carrying non-SQL-representable driver state (e.g. a
  * compiled JSON Schema) into user-facing Columns. Kept to these two
  * one-liners; everything else stays in the graft packages. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** ANSI divide-by-zero, for custom kernels that must replay the
    * Column-level Divide's error behavior (QueryExecutionErrors is
    * private[sql]). */
  def divideByZeroError(): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(null)
}
