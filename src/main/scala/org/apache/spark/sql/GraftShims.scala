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

  /** DataFrame over an arbitrary logical plan (`Dataset.ofRows` is
    * `private[sql]`) — the re-entry point for plans assembled outside
    * the parser (peer-qualified relation routing). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** DataFrame over an already-Catalyst-formatted RDD — the zero-copy
    * rehydration path (`internalCreateDataFrame` is `private[sql]`).
    * Used by operators that must pin a physical plan's partitioning
    * (execute once) and re-enter SQL without a Row encode/decode. */
  def internalDf(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
