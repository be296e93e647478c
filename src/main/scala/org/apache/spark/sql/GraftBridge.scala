package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's package-private Column ↔ Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`), needed to expose custom
  * Catalyst expressions as user-facing `Column`s in Spark 4.x. */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  /** Wrap a custom logical plan as a DataFrame (Dataset.ofRows is
    * private[sql] in Spark 4). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
