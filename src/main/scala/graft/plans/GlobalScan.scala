package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BoundReference, GenericInternalRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** DISTRIBUTED PREFIX SCAN: `running = sum(value) over rows <= current` in
  * a total order, with NO single-partition stage — [[GlobalRankPlan]]'s
  * two-pass mechanism generalized from `count` to `sum`.
  *
  * `sum(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` — the sweep-line
  * primitive behind concurrency counting, running balances, and
  * watermark accounting — plans in Spark as a single-partition WindowExec,
  * the same non-scalable shape as global row_number. Here instead:
  *
  *   1. the input is total-ordered by range partitioning (planned sort);
  *   2. pass 1 computes each partition's LOCAL SUM (numPartitions longs
  *      to the driver — the only global state);
  *   3. pass 2 emits `running = exclusivePartitionPrefix + localPrefix`.
  *
  * The value column must be LongType (the sweep deltas of the use cases
  * above; floating-point prefix sums would be order-sensitive in the last
  * ulp and break cross-engine parity anyway). */
// SQL running-sum semantics: NULL until the first non-null value, so the
// scan column must be nullable exactly when the value column is — the
// companion apply derives it (a non-null schema over a NULL-emitting exec
// would let the optimizer fold `running IS NULL` to false). No default on
// the 4th field: constructing with mismatched nullability should be a
// conscious act. Constructor field, not a body val: copy()/transform
// preserve the exprId; only genuinely fresh constructions mint one.
object GlobalScanPlan {
  def apply(order: Seq[SortOrder], value: Attribute, child: LogicalPlan,
            ansi: Boolean): GlobalScanPlan =
    GlobalScanPlan(order, value, child,
      AttributeReference("running", LongType, nullable = value.nullable)(),
      ansi)
}

case class GlobalScanPlan(order: Seq[SortOrder], value: Attribute,
    child: LogicalPlan, scanAttr: AttributeReference,
    // ANSI addition: running sums raise ArithmeticException on Long
    // overflow (SQL ANSI mode) instead of silently wrapping (legacy)
    ansi: Boolean)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ scanAttr
  override def producedAttributes
  : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(scanAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
  : GlobalScanPlan = copy(child = newChild)
}

case class GlobalScanExec(order: Seq[SortOrder], value: Attribute,
                          scanAttr: Attribute, ansi: Boolean,
                          child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ scanAttr

  override def requiredChildDistribution
  : Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order

  override protected def doExecute(): RDD[InternalRow] = {
    val valueOrdinal = child.output.indexWhere(_.exprId == value.exprId)
    require(valueOrdinal >= 0, s"value column $value not in child output")
    val bound = BoundReference(valueOrdinal, LongType,
      nullable = value.nullable)
    // same persist rationale as GlobalRankExec: the sorted child feeds two
    // passes; without it the post-shuffle sort re-runs per pass, and the
    // two passes could disagree on tie order (rows must also be copied —
    // operators reuse mutable UnsafeRow buffers)
    val input = child.execute()
      .mapPartitions(it => it.map(_.copy()), preservesPartitioning = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition (sum, non-null count) — a few longs cross the
    // driver. The count carries SQL null semantics: a running sum is NULL
    // until the first non-null value anywhere before the current row.
    // ANSI: Math.addExact raises on Long overflow. Pass 1 accumulates
    // each partition's sum in isolation, so a partition whose LOCAL sum
    // overflows raises even if a negative offset from earlier partitions
    // would have kept every global prefix in range — an over-approximation
    // of ANSI overflow, reachable only with totals adversarially close to
    // Long.MaxValue.
    val exact = ansi
    val partials = input.mapPartitions({ it =>
      var s = 0L; var c = 0L
      it.foreach(row => if (!bound.nullable || !row.isNullAt(valueOrdinal)) {
        val v = bound.eval(row).asInstanceOf[Long]
        s = if (exact) Math.addExact(s, v) else s + v
        c += 1L
      })
      Iterator.single((s, c))
    }, preservesPartitioning = true).collect()
    val offsets = GlobalScan.combineOffsets(partials.map(_._1), exact)
    val cntOffsets = partials.map(_._2).scanLeft(0L)(_ + _)
    val bc = input.sparkContext.broadcast((offsets, cntOffsets))
    // pass 2: running = exclusive partition prefix + local inclusive
    // prefix. Rows go out through an UnsafeProjection (created per task —
    // it holds codegen state): operators like collect()'s byte-array path
    // require UnsafeRow, and nothing above this node may re-project.
    val types = output.map(_.dataType).toArray
    val valueNullable = value.nullable
    input.mapPartitionsWithIndex({ (pid, it) =>
      var acc = bc.value._1(pid)
      var cnt = bc.value._2(pid)
      val n = types.length
      val proj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(types)
      // one scratch row per task, reused: the projection copies the
      // values into its own buffer before the next iteration
      val out = new GenericInternalRow(n)
      it.map { row =>
        if (!valueNullable || !row.isNullAt(valueOrdinal)) {
          val v = bound.eval(row).asInstanceOf[Long]
          acc = if (exact) Math.addExact(acc, v) else acc + v
          cnt += 1L
        }
        var j = 0
        while (j < n - 1) { out.update(j, row.get(j, types(j))); j += 1 }
        if (valueNullable && cnt == 0L) out.setNullAt(n - 1)
        else out.update(n - 1, acc)
        proj(out)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
  : GlobalScanExec = copy(child = newChild)
}

object GlobalScanStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalScanPlan =>
      GlobalScanExec(g.order, g.value, g.scanAttr, g.ansi,
        org.apache.spark.sql.execution.PlanLater(g.child)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule, the [[GlobalRankRule]] sibling: rewrite
  * `sum(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` — the running
  * sum Spark executes in ONE partition — into [[GlobalScanPlan]].
  * Conservatively fires only on the exact scale-out-safe shape: a single
  * un-partitioned window expression, plain (non-DISTINCT, unfiltered)
  * SUM over a LongType attribute, explicit ROWS frame (the default RANGE
  * frame gives ties their GROUP total — different semantics — and stays
  * with WindowExec). Null semantics preserved: the scan is NULL until
  * the first non-null value. Overflow semantics preserved per eval mode:
  * LEGACY wraps, ANSI runs the scan with exact addition (raises on Long
  * overflow); try_sum (NULL on overflow) has no per-row running
  * equivalent here and keeps WindowExec. */
object GlobalScanRule
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute => CAttr,
    CurrentRow, EvalMode, NumericEvalContext, RowFrame, SpecifiedWindowFrame,
    UnboundedPreceding, WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
  import org.apache.spark.sql.catalyst.plans.logical.{Project, Window}

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case Window(Seq(a @ Alias(WindowExpression(
          AggregateExpression(Sum(v: CAttr, ctx: NumericEvalContext),
            _, false, None, _),
          WindowSpecDefinition(Seq(), order,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
        name)), Seq(), _, child, _)
        if order.nonEmpty && v.dataType == LongType &&
          ctx.evalMode != EvalMode.TRY =>
      val g = GlobalScanPlan(order, v, child,
        ansi = ctx.evalMode == EvalMode.ANSI)
      Project(child.output :+
        Alias(g.scanAttr, name)(exprId = a.exprId, qualifier = a.qualifier,
          explicitMetadata = a.explicitMetadata),
        g)
  }
}

object GlobalScan {

  /** Exclusive prefix over per-partition sums. The driver-side combine
    * carries the same overflow contract as the per-partition sums: under
    * ANSI an overflow that lands exactly on a partition boundary must
    * raise, not wrap — otherwise every row after the boundary would get a
    * silently wrong running value while the WindowExec this replaces
    * raises. */
  private[graft] def combineOffsets(sums: Array[Long],
                                    ansi: Boolean): Array[Long] =
    sums.scanLeft(0L)((a, b) => if (ansi) Math.addExact(a, b) else a + b)

  def ensureStrategy(spark: SparkSession): Unit =
    SessionHooks.ensureStrategy(spark, GlobalScanStrategy)

  /** Register [[GlobalScanRule]] (+ its strategy) on a session,
    * idempotently: plain running-sum windows then plan as GlobalScan. */
  def ensureRule(spark: SparkSession): Unit =
    SessionHooks.ensureRule(spark, GlobalScanRule, GlobalScanStrategy)

  /** Undo [[ensureRule]] (tests; a production session keeps it). */
  def removeRule(spark: SparkSession): Unit =
    SessionHooks.removeRule(spark, GlobalScanRule)

  /** df + `running` column: prefix sum of LongType column `valueCol` under
    * the total order given by `keys` ((name, descending) pairs) — the
    * scale-out replacement for
    * `sum(value).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    * currentRow))`. */
  def runningSum(df: DataFrame, valueCol: String,
                 keys: (String, Boolean)*): DataFrame = {
    ensureStrategy(df.sparkSession)
    val plan = SessionHooks.analyzed(df)
    val value = SessionHooks.attr(plan, valueCol)
    require(value.dataType == LongType,
      s"runningSum needs a LongType value column, got ${value.dataType}")
    // Overflow semantics must match what the equivalent SQL window would
    // do on THIS session: ANSI raises, legacy wraps. Hardcoding either
    // would make the two entry points to the same operator disagree.
    SessionHooks.ofRows(df,
      GlobalScanPlan(SessionHooks.resolveOrder(plan, keys), value, plan,
        ansi = df.sparkSession.sessionState.conf.ansiEnabled))
  }
}
