package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal private[sql] bridge: build a DataFrame from a custom
  * LogicalPlan. `Dataset.ofRows` is private[sql], so this one object
  * lives under org.apache.spark.sql — the standard pattern for Spark
  * extension libraries that introduce their own plan nodes.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The engine's own DIVIDE_BY_ZERO (QueryExecutionErrors is
    * private[sql]) — lets graft expressions throw the identical ANSI
    * error Spark's Divide throws.
    */
  def divideByZeroError(): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(null)

  /** Column from a raw Catalyst Expression (the Column(expr) ctor is
    * private in Spark 4) — for graft expressions that carry non-Column
    * payloads (e.g. a codebook matrix) and so can't go through the
    * function registry.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  /** The inverse: raw Catalyst Expression of a Column — for graft
    * expressions whose child is a caller-supplied Column expression
    * (not a plain attribute name).
    */
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Drain the async listener bus (private[spark]) — dev-only probes
    * that read SparkListener counters right after an action need the
    * events flushed first.
    */
  def waitListenerBusEmpty(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
