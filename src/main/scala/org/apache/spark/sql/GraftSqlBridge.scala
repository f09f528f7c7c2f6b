package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` surface: Column ↔ Expression.
  *
  * Spark 4 hides the classic Column(expr) constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is private[sql];
  * extension libraries conventionally expose it via a small shim in the
  * org.apache.spark.sql package. Nothing else from the private surface is
  * used.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a custom logical plan (classic Dataset.ofRows). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Natural ordering over a type's internal representation (int/long/
    * Decimal/UTF8String/…) — what SortExec itself uses for interpreted
    * comparisons. Needed by custom physical operators that order keys. */
  def interpretedOrdering(dt: types.DataType): Ordering[Any] =
    catalyst.util.TypeUtils.getInterpretedOrdering(dt)

  /** Whether a type has a total order usable for sorting/range comparison. */
  def isOrderable(dt: types.DataType): Boolean =
    catalyst.expressions.RowOrdering.isOrderable(dt)
}
