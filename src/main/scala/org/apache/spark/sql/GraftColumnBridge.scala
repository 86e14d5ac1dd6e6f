package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column ↔ Expression converters (Spark 4
  * moved them behind `private[sql]` in the Connect refactor). Standard
  * extension-library pattern: one object inside the package.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
