package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for Spark 4's `private[sql]` Column↔Expression converters —
  * the sanctioned pattern for extension libraries shipping native
  * Catalyst expressions (the public API only builds Columns from SQL
  * text or other Columns). Lives in the `org.apache.spark.sql` package
  * solely for access; no Spark internals are modified.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
