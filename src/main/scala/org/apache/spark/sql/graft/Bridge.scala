package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` node-based and gated the Expression<->Column
  * converters as `private[sql]` (`classic.ExpressionUtils`). Extension
  * libraries that ship custom Catalyst expressions bridge from inside the
  * `org.apache.spark.sql` package — same pattern the public Delta/Sedona
  * codebases use. This is the only file outside the `graft` namespace. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (possibly custom) logical plan as a DataFrame — the classic
    * `Dataset.ofRows` is `private[sql]` in Spark 4. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
