package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BoundReference, GenericInternalRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** DISTRIBUTED PREFIX SCAN: `running = agg(value) over rows <= current` in
  * a total order, with NO single-partition stage — [[GlobalRankPlan]]'s
  * two-pass mechanism generalized from `count` to the prefix aggregates
  * (sum / count / count(*) / min / max / avg).
  *
  * `agg(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` — the sweep-line
  * primitive behind concurrency counting, running balances, high-water
  * marks, and watermark accounting — plans in Spark as a single-partition
  * WindowExec, the same non-scalable shape as global row_number. Here
  * instead:
  *
  *   1. the input is total-ordered by range partitioning (planned sort);
  *   2. pass 1 computes each partition's LOCAL partial (sum, non-null
  *      count, row count, min, max — a few longs per partition to the
  *      driver, the only global state);
  *   3. pass 2 emits `running = combine(exclusivePartitionPrefix,
  *      localPrefix)` — addition for sum/count, min/max fold for the
  *      extrema, exact-integer division at emit for avg.
  *
  * The value column must be LongType (the sweep deltas of the use cases
  * above; floating-point prefix sums would be order-sensitive in the last
  * ulp and break cross-engine parity anyway — avg divides the EXACT long
  * sum by the exact count at emit, so even its doubles are
  * order-insensitive).
  *
  * Overflow parity with the WindowExec this replaces, per kind:
  * sum — ANSI raises on Long overflow, legacy wraps (native does the
  * same). avg — native accumulates in Double and NEVER overflows (either
  * eval mode), so avg here must not raise or wrap either: it carries a
  * parallel Double sum and switches to it (sticky, per prefix) the moment
  * the exact long sum overflows. In-range prefixes keep the exact
  * long-sum/count division (cross-engine-reproducible); post-overflow
  * prefixes degrade to native's approximately-correct double semantics
  * instead of ANSI exceptions or wildly-wrong wrapped longs. */
sealed abstract class ScanKind(val sql: String)
object ScanKind {
  /** running sum of the value column (null until first non-null) */
  case object Sum extends ScanKind("sum")
  /** running count of NON-NULL values (never null, 0 until first) */
  case object Count extends ScanKind("count")
  /** running count of ALL rows — `count(*)` (never null) */
  case object Rows extends ScanKind("count(*)")
  case object Min extends ScanKind("min")
  case object Max extends ScanKind("max")
  /** running exact-sum / exact-count as double (null until first) */
  case object Avg extends ScanKind("avg")
}
// SQL running-sum semantics: NULL until the first non-null value, so the
// scan column must be nullable exactly when the value column is — the
// companion apply derives it (a non-null schema over a NULL-emitting exec
// would let the optimizer fold `running IS NULL` to false). No default on
// the 4th field: constructing with mismatched nullability should be a
// conscious act. Constructor field, not a body val: copy()/transform
// preserve the exprId; only genuinely fresh constructions mint one.
object GlobalScanPlan {
  def apply(order: Seq[SortOrder], value: Attribute, child: LogicalPlan,
            ansi: Boolean, kind: ScanKind = ScanKind.Sum): GlobalScanPlan = {
    // output type/nullability mirror the window aggregate this replaces:
    // counts are non-null longs, avg is a nullable double, sum/min/max
    // are null exactly until the first non-null value — i.e. nullable
    // iff the value column is
    val (dt, nullable) = kind match {
      case ScanKind.Count | ScanKind.Rows =>
        (LongType: org.apache.spark.sql.types.DataType, false)
      case ScanKind.Avg =>
        (org.apache.spark.sql.types.DoubleType, value.nullable)
      case _ => (LongType, value.nullable)
    }
    GlobalScanPlan(order, value, child,
      AttributeReference("running", dt, nullable)(), ansi, kind)
  }
}

case class GlobalScanPlan(order: Seq[SortOrder], value: Attribute,
    child: LogicalPlan, scanAttr: AttributeReference,
    // ANSI addition: running sums raise ArithmeticException on Long
    // overflow (SQL ANSI mode) instead of silently wrapping (legacy)
    ansi: Boolean, kind: ScanKind)
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
                          scanAttr: Attribute, ansi: Boolean, kind: ScanKind,
                          child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ scanAttr

  override def requiredChildDistribution
  : Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  // per-partition 1:1 operator: rows never move, so the child's (range)
  // partitioning survives — without this the default UnknownPartitioning
  // makes EnsureRequirements re-shuffle every consumer that wants the
  // same distribution (e.g. a second scan stacked on this one)
  override def outputPartitioning
  : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

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
    // pass 1: per-partition partial (sum, non-null count, row count, min,
    // max, double-sum, overflow flag) — a few scalars per partition cross
    // the driver. The non-null count carries SQL null semantics: a running
    // sum/min/max/avg is NULL until the first non-null value anywhere
    // before the current row.
    // Overflow, per kind: sum under ANSI raises via Math.addExact (native
    // window sum raises too), sum under legacy wraps (native wraps). Avg
    // NEVER raises in either mode — native accumulates avg in Double — so
    // its exact long sum is tried under a catch: on overflow the partition
    // freezes its long partial and reports ovf=true, and the double sum
    // carries on. Pass 1 accumulates each partition in isolation, so a
    // partition whose LOCAL sum overflows marks (sum) raises / (avg)
    // degrades even if a negative offset from earlier partitions would
    // have kept every global prefix in range — an over-approximation,
    // reachable only with totals adversarially close to Long.MaxValue.
    val needSum = kind == ScanKind.Sum || kind == ScanKind.Avg
    // Count only null-checks the value; Rows never touches it (the plan
    // carries a dummy attribute there). Evaluating a non-Long dummy as
    // Long would be a type error, so the eval is gated, not just unused.
    val needEval =
      needSum || kind == ScanKind.Min || kind == ScanKind.Max
    val countsValue = kind != ScanKind.Rows
    val isAvg = kind == ScanKind.Avg
    val exact = ansi && kind == ScanKind.Sum
    val theKind = kind // stable local for task closures
    val partials = input.mapPartitions({ it =>
      var s = 0L; var c = 0L; var r = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      var d = 0.0; var ovf = false
      it.foreach { row =>
        r += 1L
        if (countsValue &&
            (!bound.nullable || !row.isNullAt(valueOrdinal))) {
          c += 1L
          if (needEval) {
            val v = bound.eval(row).asInstanceOf[Long]
            if (needSum) {
              if (isAvg) {
                d += v
                if (!ovf) {
                  try s = Math.addExact(s, v)
                  catch { case _: ArithmeticException => ovf = true }
                }
              } else s = if (exact) Math.addExact(s, v) else s + v
            }
            if (v < mn) mn = v
            if (v > mx) mx = v
          }
        }
      }
      Iterator.single((s, c, r, mn, mx, d, ovf))
    }, preservesPartitioning = true).collect()
    // avg: exact long offsets while every earlier partial is exact and the
    // combine itself stays in range; from the first overflow on, only the
    // double offsets are meaningful (exactStart marks the switch)
    val (sumOffsets, dblOffsets, exactStart) =
      if (isAvg)
        GlobalScan.combineAvgOffsets(partials.map(_._1),
          partials.map(_._6), partials.map(_._7))
      else (
        if (needSum) GlobalScan.combineOffsets(partials.map(_._1), exact)
        else Array.fill(partials.length + 1)(0L),
        Array.fill(partials.length + 1)(0.0),
        Array.fill(partials.length + 1)(true))
    val cntOffsets = partials.map(_._2).scanLeft(0L)(_ + _)
    val rowOffsets = partials.map(_._3).scanLeft(0L)(_ + _)
    // extrema offsets fold with identity elements; validity is carried by
    // cntOffsets (an offset min/max is meaningful iff some non-null value
    // exists in an earlier partition)
    val minOffsets = partials.map(_._4).scanLeft(Long.MaxValue)(Math.min)
    val maxOffsets = partials.map(_._5).scanLeft(Long.MinValue)(Math.max)
    val bc = input.sparkContext.broadcast(
      (sumOffsets, cntOffsets, rowOffsets, minOffsets, maxOffsets,
        dblOffsets, exactStart))
    // pass 2: running = combine(exclusive partition prefix, local
    // inclusive prefix). Rows go out through an UnsafeProjection (created
    // per task — it holds codegen state): operators like collect()'s
    // byte-array path require UnsafeRow, and nothing above this node may
    // re-project.
    val types = output.map(_.dataType).toArray
    val valueNullable = value.nullable
    input.mapPartitionsWithIndex({ (pid, it) =>
      val (sumOff, cntOff, rowOff, minOff, maxOff, dblOff, exOk) = bc.value
      var acc = sumOff(pid)
      var cnt = cntOff(pid)
      var rows = rowOff(pid)
      var mn = minOff(pid)
      var mx = maxOff(pid)
      var dacc = dblOff(pid)
      var exactOk = exOk(pid)
      val n = types.length
      val proj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(types)
      // one scratch row per task, reused: the projection copies the
      // values into its own buffer before the next iteration
      val out = new GenericInternalRow(n)
      it.map { row =>
        rows += 1L
        if (countsValue &&
            (!valueNullable || !row.isNullAt(valueOrdinal))) {
          cnt += 1L
          if (needEval) {
            val v = bound.eval(row).asInstanceOf[Long]
            if (needSum) {
              if (isAvg) {
                dacc += v
                // sticky per prefix: once any prefix overflows Long, this
                // and every later prefix emit from the double sum (native
                // Average's accumulator semantics); earlier prefixes
                // already went out exact
                if (exactOk) {
                  try acc = Math.addExact(acc, v)
                  catch { case _: ArithmeticException => exactOk = false }
                }
              } else acc = if (exact) Math.addExact(acc, v) else acc + v
            }
            if (v < mn) mn = v
            if (v > mx) mx = v
          }
        }
        var j = 0
        while (j < n - 1) { out.update(j, row.get(j, types(j))); j += 1 }
        theKind match {
          case ScanKind.Rows => out.update(n - 1, rows)
          case ScanKind.Count => out.update(n - 1, cnt)
          case _ if cnt == 0L => out.setNullAt(n - 1)
          case ScanKind.Sum => out.update(n - 1, acc)
          case ScanKind.Min => out.update(n - 1, mn)
          case ScanKind.Max => out.update(n - 1, mx)
          // exact long sum / exact count, divided at emit: the double is
          // a function of the prefix CONTENT, not its evaluation order.
          // Post-overflow (exactOk false) the double sum takes over.
          case ScanKind.Avg =>
            out.update(n - 1,
              if (exactOk) acc.toDouble / cnt else dacc / cnt)
        }
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
      GlobalScanExec(g.order, g.value, g.scanAttr, g.ansi, g.kind,
        org.apache.spark.sql.execution.PlanLater(g.child)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule, the [[GlobalRankRule]] sibling: rewrite
  * `agg(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` — the running
  * aggregate Spark executes in ONE partition — into [[GlobalScanPlan]],
  * for agg in sum / count / count(*) / min / max / avg. Conservatively
  * fires only on the exact scale-out-safe shape: a single un-partitioned
  * window expression, plain (non-DISTINCT, unfiltered) aggregate over a
  * LongType or narrower-integral attribute — including the
  * `Cast(int -> long)` the analyzer wraps around integral sum inputs;
  * narrower values are widened below the scan and min/max results
  * narrowed back, so schemas are unchanged (count: any type — it only
  * null-checks; count(*): no column at all), explicit ROWS frame (the default RANGE frame gives
  * ties their GROUP total — different semantics — and stays with
  * WindowExec). Null semantics preserved: sum/min/max/avg are NULL until
  * the first non-null value, counts never. Overflow semantics preserved
  * per eval mode: sum LEGACY wraps, sum ANSI runs the scan with exact
  * addition (raises on Long overflow) — both native-parity; avg never
  * raises in either mode (native accumulates in Double) — the scan tries
  * the exact long sum and degrades to its double sum on overflow;
  * try_sum/try_avg (NULL on overflow) have no per-row running equivalent
  * here and keep WindowExec. */
object GlobalScanRule
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute => CAttr,
    Cast, CurrentRow, EvalMode, Expression, Literal, NumericEvalContext,
    RowFrame, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression,
    WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
  import org.apache.spark.sql.catalyst.plans.logical.{Project, Window}
  import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}

  private def integral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == IntegerType || dt == ShortType || dt == ByteType

  /** The scan's long-valued input: a LongType attribute, a narrower
    * integral attribute (the exec runs on Long — the rewrite widens it
    * below the scan), or the `Cast(integral -> long)` the analyzer wraps
    * around integral sum inputs — `sum(int_col)` analyzes as
    * `Sum(Cast(attr, LongType))`, the common case. The upcast can neither
    * null nor overflow, so value/null semantics are the attribute's own. */
  private object LongValue {
    def unapply(e: Expression): Option[CAttr] = e match {
      case v: CAttr if v.dataType == LongType || integral(v.dataType) =>
        Some(v)
      case Cast(v: CAttr, LongType, _, _) if integral(v.dataType) => Some(v)
      case _ => None
    }
  }

  /** (kind, value column, ansi) for a rewritable aggregate, else None.
    * count(*) carries no column — any child attribute serves as the
    * (never evaluated) placeholder the plan node wants. */
  private def scannable(agg: AggregateExpression,
                        child: LogicalPlan): Option[(ScanKind, CAttr, Boolean)] =
    agg.aggregateFunction match {
      case Sum(LongValue(v), ctx: NumericEvalContext)
          if ctx.evalMode != EvalMode.TRY =>
        Some((ScanKind.Sum, v, ctx.evalMode == EvalMode.ANSI))
      case Count(Seq(v: CAttr)) =>
        Some((ScanKind.Count, v, false))
      // count over the analyzer's integral upcast: the cast never nulls,
      // so counting its results == counting the attribute's non-nulls
      case Count(Seq(Cast(v: CAttr, LongType, _, _)))
          if integral(v.dataType) =>
        Some((ScanKind.Count, v, false))
      case Count(Seq(l: Literal)) if l.value != null =>
        child.output.headOption.map((ScanKind.Rows, _, false))
      case Min(LongValue(v)) => Some((ScanKind.Min, v, false))
      case Max(LongValue(v)) => Some((ScanKind.Max, v, false))
      case Average(LongValue(v), mode) if mode != EvalMode.TRY =>
        Some((ScanKind.Avg, v, mode == EvalMode.ANSI))
      case _ => None
    }

  /** One window expression parsed for rewriting: its Alias, its order,
    * and the scan parameters. */
  private type Parsed = (Alias, Seq[SortOrder], (ScanKind, CAttr, Boolean))

  private def parse(e: org.apache.spark.sql.catalyst.expressions
      .NamedExpression, child: LogicalPlan): Option[Parsed] = e match {
    case a @ Alias(WindowExpression(agg: AggregateExpression,
          WindowSpecDefinition(Seq(), order,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
        _) if order.nonEmpty && !agg.isDistinct && agg.filter.isEmpty =>
      scannable(agg, child).map(s => (a, order, s))
    case _ => None
  }

  /** Stack one scan on `plan` for a parsed expression; returns the new
    * plan plus the result expression to project under the alias. */
  private def stack(plan: LogicalPlan, child: LogicalPlan,
      order: Seq[SortOrder], p: Parsed): (LogicalPlan, Expression) = {
    val (a, _, (kind, v, ansi)) = p
    // narrower integral values are widened to the scan's Long domain in
    // a Project BELOW the scan; the helper column never escapes (the
    // outer Project re-selects only child.output + the results)
    val (inner, value) =
      if (v.dataType == LongType) (plan, v)
      else {
        val widened = Alias(Cast(v, LongType), v.name + "_scanl")()
        (Project(plan.output :+ widened, plan),
          widened.toAttribute): (LogicalPlan, CAttr)
      }
    val g = GlobalScanPlan(order, value, inner, ansi, kind)
    // min/max over an integral column keep its type (min(int) is int):
    // narrow the scan's long back so the output schema is unchanged —
    // values are original column values, the downcast cannot overflow
    val result: Expression =
      if (g.scanAttr.dataType == a.dataType) g.scanAttr
      else Cast(g.scanAttr, a.dataType)
    (g, result)
  }

  /** At most this many expressions of one window are stacked: each scan
    * persists its input across its two passes, so the rewrite costs one
    * MEMORY_AND_DISK copy per expression (only the FIRST pays the
    * exchange + sort — a scan's output keeps the range partitioning and
    * ordering, satisfying the next scan's requirements). Past this,
    * review whether a single multi-kind pass is worth building. */
  private val MaxStacked = 4

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case w @ Window(exprs, Seq(), _, child, _)
        if exprs.nonEmpty && exprs.size <= MaxStacked =>
      val parsed = exprs.map(parse(_, child))
      // all-or-nothing: rewriting a subset would still leave a
      // single-partition Window for the rest — no win, extra passes
      val orders = parsed.flatten.map(_._2).distinct
      if (parsed.exists(_.isEmpty) || orders.size != 1) w
      else {
        val order = orders.head
        var acc: LogicalPlan = child
        val results = parsed.flatten.map { p =>
          val (next, result) = stack(acc, child, order, p)
          acc = next
          (p._1, result)
        }
        Project(child.output ++ results.map { case (a, result) =>
          Alias(result, a.name)(exprId = a.exprId,
            qualifier = a.qualifier,
            explicitMetadata = a.explicitMetadata)
        }, acc): LogicalPlan
      }
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

  /** Avg's offset combine: exclusive prefixes of the exact long sums, the
    * double sums, and a per-partition "exact start" validity. Exactness is
    * sticky-false from the first partition whose local sum overflowed OR
    * whose combine step overflows: from there the long offsets are
    * meaningless and pass 2 emits from the double offsets — avg must
    * never raise or wrap (the native window Average it replaces
    * accumulates in Double and cannot overflow in either eval mode). */
  private[graft] def combineAvgOffsets(sums: Array[Long],
      dsums: Array[Double], ovfs: Array[Boolean])
  : (Array[Long], Array[Double], Array[Boolean]) = {
    val n = sums.length
    val so = new Array[Long](n + 1)
    val dlo = new Array[Double](n + 1)
    val ok = new Array[Boolean](n + 1)
    ok(0) = true
    var s = 0L; var d = 0.0; var valid = true
    var i = 0
    while (i < n) {
      d += dsums(i)
      if (valid && !ovfs(i)) {
        try s = Math.addExact(s, sums(i))
        catch { case _: ArithmeticException => valid = false }
      } else valid = false
      so(i + 1) = s; dlo(i + 1) = d; ok(i + 1) = valid
      i += 1
    }
    (so, dlo, ok)
  }

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
