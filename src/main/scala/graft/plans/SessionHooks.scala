package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.Strategy

/** Shared session-registration and order-resolution helpers for the custom
  * operators (GlobalRank, GlobalScan): one definition of the idempotent
  * experimental-list mutation and the (name, descending) -> SortOrder
  * resolution, so a fix (thread-safety, error messages) lands once. */
private[graft] object SessionHooks {

  private def classic(spark: SparkSession)
  : org.apache.spark.sql.classic.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  // The experimental lists are bare vars with no synchronization of their
  // own; check-then-act on them from concurrent threads could register a
  // strategy/rule twice (rules then run twice per optimizer pass). One
  // global lock keeps the idempotency contract actually true — these calls
  // are rare (session setup), never hot-path.
  def ensureStrategy(spark: SparkSession, s: Strategy): Unit =
    SessionHooks.synchronized {
      val c = classic(spark)
      if (!c.experimental.extraStrategies.contains(s))
        c.experimental.extraStrategies = s +: c.experimental.extraStrategies
    }

  def ensureRule(spark: SparkSession, r: Rule[LogicalPlan],
                 s: Strategy): Unit = {
    ensureStrategy(spark, s)
    SessionHooks.synchronized {
      val c = classic(spark)
      if (!c.experimental.extraOptimizations.contains(r))
        c.experimental.extraOptimizations =
          r +: c.experimental.extraOptimizations
    }
  }

  // Deliberately leaves the paired strategy registered: a strategy alone
  // only fires on explicitly constructed Graft plan nodes (it rewrites
  // nothing), and the DataFrame-API entry points (GlobalRank.ranked,
  // GlobalScan.runningSum) depend on it staying.
  def removeRule(spark: SparkSession, r: Rule[LogicalPlan]): Unit =
    SessionHooks.synchronized {
      val c = classic(spark)
      c.experimental.extraOptimizations =
        c.experimental.extraOptimizations.filterNot(_ == r)
    }

  /** The analyzed plan of `df` plus its attribute-by-name resolver. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  def attr(plan: LogicalPlan, name: String): Attribute =
    plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"no column $name in ${plan.output.map(_.name).mkString(", ")}"))

  def resolveOrder(plan: LogicalPlan,
                   keys: Seq[(String, Boolean)]): Seq[SortOrder] =
    keys.map { case (name, desc) =>
      SortOrder(attr(plan, name),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }

  def ofRows(df: DataFrame, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.graftbridge.Bridge.ofRows(
      classic(df.sparkSession), plan)
}
