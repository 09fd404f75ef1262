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

  /** Exact integer division (truncating), avoiding the double round-trip
    * of `Column./` that loses precision above 2^53. */
  def integralDivide(l: Column, r: Column): Column =
    column(catalyst.expressions.IntegralDivide(expression(l), expression(r)))

  /** SQL-standard exact discrete percentile (the engine aggregate behind
    * `percentile_disc(p) WITHIN GROUP (ORDER BY c)`): smallest value
    * whose cumulative distribution >= p. Buffers (value -> count) with
    * map-side partial merge — no per-group collect_list materialization. */
  def percentileDisc(c: Column, p: Double): Column =
    column(catalyst.expressions.aggregate.PercentileDisc(
      expression(c), catalyst.expressions.Literal(p))
      .toAggregateExpression())

  /** Register a function on a live session's registry (the
    * SparkSessionExtensions route only applies at session build time). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.functions.NativeExpressions", name),
      builder)
}
