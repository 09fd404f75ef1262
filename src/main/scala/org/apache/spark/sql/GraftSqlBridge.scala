package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge to the `private[sql]` Expression↔Column conversions —
 * the standard technique for libraries that ship custom Catalyst
 * expressions (the conversion is public API in spirit: every built-in
 * function in `org.apache.spark.sql.functions` uses it).
 */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
