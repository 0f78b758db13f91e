package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 made `Column` API-agnostic (backed by `ColumnNode`); the
  * classic-session conversion helpers are `private[sql]`, so this shim
  * lives inside the `org.apache.spark.sql` package tree.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the listener bus (`private[spark]`) — metrics assertions
    * (e.g. the resource-contract specs summing task-result bytes) must
    * flush async listener events before reading their accumulators. */
  def waitListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
