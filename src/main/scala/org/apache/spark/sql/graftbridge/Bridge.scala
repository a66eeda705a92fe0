package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Minimal `private[sql]` bridge for building a DataFrame from a custom
  * LogicalPlan — the standard technique for Spark extension libraries
  * (a tiny shim compiled into an `org.apache.spark.sql` subpackage). */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  /** Wrap a raw Catalyst Expression as a Column (classic API). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
  : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Extract the Catalyst Expression backing a Column (classic API). */
  def expression(c: org.apache.spark.sql.Column)
  : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Drop the cached blocks behind a `localCheckpoint`ed DataFrame the
    * caller no longer needs. Dataset exposes no unpersist for checkpoint
    * RDDs — without this, iterative drivers (label propagation) accumulate
    * one materialized RDD per round until the ContextCleaner eventually
    * notices; an explicit release bounds the footprint to two rounds. */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
