package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BoundReference, GenericInternalRow, RowOrdering, SortOrder}
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
  * Both frames of the running shape are supported. ROWS UNBOUNDED
  * PRECEDING emits per row from the live accumulators. The default RANGE
  * frame (`agg(x) OVER (ORDER BY ...)` with no frame clause — the most
  * common user spelling) gives every PEER (order-tie) the tie group's
  * total, and a peer group may SPAN partition boundaries
  * (OrderedDistribution does not co-locate equal keys): pass 1 then also
  * ships each partition's first/last row and its LEADING tie-run's own
  * partial, the driver chains a per-partition "trailing-group completion"
  * delta (the later-partition peers of the partition's last group —
  * [[GlobalTiesExec]]'s boundary-chain idea applied to aggregates), and
  * pass 2 buffers one peer group at a time, emitting the group-end value
  * (+ the delta for the partition's last group). Memory: the largest peer
  * group per task — the same buffer WindowExec keeps for a RANGE frame,
  * but distributed instead of all rows in one task.
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
            ansi: Boolean, kind: ScanKind = ScanKind.Sum,
            range: Boolean = false): GlobalScanPlan = {
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
      AttributeReference("running", dt, nullable)(), ansi, kind, range)
  }
}

case class GlobalScanPlan(order: Seq[SortOrder], value: Attribute,
    child: LogicalPlan, scanAttr: AttributeReference,
    // ANSI addition: running sums raise ArithmeticException on Long
    // overflow (SQL ANSI mode) instead of silently wrapping (legacy)
    ansi: Boolean, kind: ScanKind,
    // true: the default RANGE frame — peers (order ties) share the tie
    // group's total; false: ROWS — each row its own prefix
    range: Boolean)
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
                          range: Boolean, child: SparkPlan)
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

  import GlobalScanExec.ScanDelta

  override protected def doExecute(): RDD[InternalRow] = {
    val valueOrdinal = child.output.indexWhere(_.exprId == value.exprId)
    require(valueOrdinal >= 0, s"value column $value not in child output")
    val bound = BoundReference(valueOrdinal, LongType,
      nullable = value.nullable)
    val orderLocal = order
    val childOutput = child.output
    val isRange = range
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
    // RANGE additionally records the partition's first/last row (copies —
    // the persisted input is copied) and the LEADING tie-run's own
    // partial, so the driver can complete a peer group spanning partition
    // boundaries without seeing any interior row.
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
      val cmp = if (isRange) RowOrdering.create(orderLocal, childOutput)
        else null
      var s = 0L; var c = 0L; var r = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      var d = 0.0; var ovf = false
      var first: InternalRow = null; var prev: InternalRow = null
      var leading = true; var leadEq = 0L
      var ls = 0L; var lc = 0L
      var lmn = Long.MaxValue; var lmx = Long.MinValue
      var ld = 0.0; var lovf = false
      it.foreach { row =>
        if (isRange) {
          // leading iff the row ties the partition's FIRST row (ties are
          // transitive under compare == 0, so first-vs-row == prev-vs-row)
          if (first == null) first = row
          else if (leading && cmp.compare(first, row) != 0) leading = false
          prev = row
          if (leading) leadEq += 1L
        }
        r += 1L
        if (countsValue &&
            (!bound.nullable || !row.isNullAt(valueOrdinal))) {
          c += 1L
          if (isRange && leading) lc += 1L
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
            if (isRange && leading) {
              if (needSum) {
                if (isAvg) {
                  ld += v
                  if (!lovf) {
                    try ls = Math.addExact(ls, v)
                    catch { case _: ArithmeticException => lovf = true }
                  }
                } else ls = if (exact) Math.addExact(ls, v) else ls + v
              }
              if (v < lmn) lmn = v
              if (v > lmx) lmx = v
            }
          }
        }
      }
      Iterator.single(GlobalScanExec.ScanPartial(s, c, r, mn, mx, d, ovf,
        first, prev, leadEq, ls, lc, lmn, lmx, ld, lovf))
    }, preservesPartitioning = true).collect()
    // avg: exact long offsets while every earlier partial is exact and the
    // combine itself stays in range; from the first overflow on, only the
    // double offsets are meaningful (exactStart marks the switch)
    val (sumOffsets, dblOffsets, exactStart) =
      if (isAvg)
        GlobalScan.combineAvgOffsets(partials.map(_.sum),
          partials.map(_.dsum), partials.map(_.ovf))
      else (
        if (needSum) GlobalScan.combineOffsets(partials.map(_.sum), exact)
        else Array.fill(partials.length + 1)(0L),
        Array.fill(partials.length + 1)(0.0),
        Array.fill(partials.length + 1)(true))
    val cntOffsets = partials.map(_.cnt).scanLeft(0L)(_ + _)
    val rowOffsets = partials.map(_.rows).scanLeft(0L)(_ + _)
    // extrema offsets fold with identity elements; validity is carried by
    // cntOffsets (an offset min/max is meaningful iff some non-null value
    // exists in an earlier partition)
    val minOffsets = partials.map(_.mn).scanLeft(Long.MaxValue)(Math.min)
    val maxOffsets = partials.map(_.mx).scanLeft(Long.MinValue)(Math.max)
    // RANGE: per-partition trailing-group completion — the chained
    // leading-run partials of LATER partitions whose rows tie this
    // partition's last row ([[GlobalTiesExec]]'s boundary chain, applied
    // to aggregates). O(numPartitions) driver work on a few rows. The
    // delta's exact long sum folds under the same overflow contract as
    // the offsets: ANSI sum raises (the native frame containing those
    // peers would raise too — same over-approximation as pass 1), legacy
    // wraps, avg degrades to its double sum.
    val deltas = Array.fill(partials.length)(ScanDelta.empty)
    if (isRange) {
      val cmp = RowOrdering.create(orderLocal, childOutput)
      var p = 0
      while (p < partials.length) {
        val pp = partials(p)
        if (pp.rows > 0L) {
          var sD = 0L; var cD = 0L; var rD = 0L
          var mnD = Long.MaxValue; var mxD = Long.MinValue
          var dD = 0.0; var exD = true
          var q = p + 1; var chained = true
          while (chained && q < partials.length) {
            val pq = partials(q)
            if (pq.rows == 0L) q += 1 // empty partitions are transparent
            else if (cmp.compare(pp.last, pq.first) == 0) {
              rD += pq.leadEq; cD += pq.lcnt; dD += pq.ld
              if (pq.lmn < mnD) mnD = pq.lmn
              if (pq.lmx > mxD) mxD = pq.lmx
              if (isAvg) {
                if (exD && !pq.lovf) {
                  try sD = Math.addExact(sD, pq.lsum)
                  catch { case _: ArithmeticException => exD = false }
                } else exD = false
              } else sD = if (exact) Math.addExact(sD, pq.lsum)
                else sD + pq.lsum
              // the chain continues past q only if ALL of q is one group
              chained = pq.leadEq == pq.rows
              q += 1
            } else chained = false
          }
          deltas(p) = ScanDelta(sD, cD, rD, mnD, mxD, dD, exD)
        }
        p += 1
      }
    }
    val bc = input.sparkContext.broadcast(
      (sumOffsets, cntOffsets, rowOffsets, minOffsets, maxOffsets,
        dblOffsets, exactStart, deltas))
    // pass 2: running = combine(exclusive partition prefix, local
    // inclusive prefix). Rows go out through an UnsafeProjection (created
    // per task — it holds codegen state): operators like collect()'s
    // byte-array path require UnsafeRow, and nothing above this node may
    // re-project.
    val types = output.map(_.dataType).toArray
    val valueNullable = value.nullable
    input.mapPartitionsWithIndex({ (pid, it) =>
      val (sumOff, cntOff, rowOff, minOff, maxOff, dblOff, exOk, deltaArr) =
        bc.value
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
      def accumulate(row: InternalRow): Unit = {
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
      }
      def fill(row: InternalRow): Unit = {
        var j = 0
        while (j < n - 1) { out.update(j, row.get(j, types(j))); j += 1 }
      }
      if (!isRange) it.map { row =>
        accumulate(row)
        fill(row)
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
      } else {
        // RANGE: buffer one peer group at a time (row references into the
        // persisted, copied input — safe to hold), emit the group-end
        // value to every peer; the partition's LAST group folds in the
        // driver-chained completion delta (identity when its last row has
        // no later-partition peers). Memory: the largest peer group.
        val delta = deltaArr(pid)
        val cmp2 = RowOrdering.create(orderLocal, childOutput)
        val peers = it.buffered
        val group = new scala.collection.mutable.ArrayBuffer[InternalRow]
        var gi = 0
        var gNull = false
        var gVal: Any = null
        new Iterator[InternalRow] {
          override def hasNext: Boolean =
            gi < group.length || peers.hasNext
          override def next(): InternalRow = {
            if (gi >= group.length) {
              group.clear(); gi = 0
              val head = peers.next(); group += head
              while (peers.hasNext &&
                  cmp2.compare(head, peers.head) == 0)
                group += peers.next()
              var i = 0
              while (i < group.length) { accumulate(group(i)); i += 1 }
              val last = !peers.hasNext
              val tc = cnt + (if (last) delta.cnt else 0L)
              gNull = false
              gVal = theKind match {
                case ScanKind.Rows =>
                  rows + (if (last) delta.rows else 0L)
                case ScanKind.Count => tc
                case _ if tc == 0L => gNull = true; null
                case ScanKind.Sum =>
                  if (!last) acc
                  else if (exact) Math.addExact(acc, delta.sum)
                  else acc + delta.sum
                case ScanKind.Min =>
                  if (last) Math.min(mn, delta.mn) else mn
                case ScanKind.Max =>
                  if (last) Math.max(mx, delta.mx) else mx
                case ScanKind.Avg =>
                  val dTotal = dacc + (if (last) delta.d else 0.0)
                  if (exactOk && (!last || delta.exact)) {
                    try {
                      (if (last) Math.addExact(acc, delta.sum)
                       else acc).toDouble / tc
                    } catch {
                      case _: ArithmeticException => dTotal / tc
                    }
                  } else dTotal / tc
              }
            }
            val row = group(gi); gi += 1
            fill(row)
            if (gNull) out.setNullAt(n - 1) else out.update(n - 1, gVal)
            proj(out)
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
  : GlobalScanExec = copy(child = newChild)
}

object GlobalScanExec {
  /** Per-partition pass-1 summary. The base fields cover the whole
    * partition; `first`/`last` are row COPIES (null on an empty
    * partition) and the `l*` fields are the LEADING tie-run's own partial
    * — only meaningful under a RANGE frame, identity otherwise. Top-level
    * (not nested in the exec) so task closures don't drag the SparkPlan
    * in. */
  private[plans] case class ScanPartial(sum: Long, cnt: Long, rows: Long,
      mn: Long, mx: Long, dsum: Double, ovf: Boolean,
      first: InternalRow, last: InternalRow, leadEq: Long,
      lsum: Long, lcnt: Long, lmn: Long, lmx: Long, ld: Double,
      lovf: Boolean)

  /** Driver-chained completion of a partition's trailing peer group: the
    * folded leading-run partials of later partitions tying its last row.
    * `exact` false means the long `sum` overflowed somewhere in the chain
    * and avg must emit from the double `d`. */
  private[plans] case class ScanDelta(sum: Long, cnt: Long, rows: Long,
      mn: Long, mx: Long, d: Double, exact: Boolean)
  private[plans] object ScanDelta {
    val empty: ScanDelta =
      ScanDelta(0L, 0L, 0L, Long.MaxValue, Long.MinValue, 0.0, exact = true)
  }
}

object GlobalScanStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalScanPlan =>
      GlobalScanExec(g.order, g.value, g.scanAttr, g.ansi, g.kind, g.range,
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
  * null-checks; count(*): no column at all). BOTH running frames rewrite:
  * explicit ROWS, and the default RANGE the analyzer gives a frameless
  * `agg(x) OVER (ORDER BY ...)` — the exec emits peer groups their group
  * total there (see [[GlobalScanPlan]]). Null semantics preserved:
  * sum/min/max/avg are NULL until
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
    RangeFrame, RowFrame, SpecifiedWindowFrame, UnboundedPreceding,
    WindowExpression, WindowSpecDefinition}
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
    * its frame, and the scan parameters. */
  private case class Parsed(alias: Alias, order: Seq[SortOrder],
      range: Boolean, kind: ScanKind, value: CAttr, ansi: Boolean)

  private def parse(e: org.apache.spark.sql.catalyst.expressions
      .NamedExpression, child: LogicalPlan): Option[Parsed] = e match {
    case a @ Alias(WindowExpression(agg: AggregateExpression,
          WindowSpecDefinition(Seq(), order,
            SpecifiedWindowFrame(ft, UnboundedPreceding, CurrentRow))),
        _) if order.nonEmpty && !agg.isDistinct && agg.filter.isEmpty &&
          (ft == RowFrame || ft == RangeFrame) =>
      scannable(agg, child).map { case (kind, v, ansi) =>
        Parsed(a, order, ft == RangeFrame, kind, v, ansi) }
    case _ => None
  }

  /** Stack one scan on `plan` for a parsed expression; returns the new
    * plan plus the result expression to project under the alias. */
  private def stack(plan: LogicalPlan, p: Parsed)
  : (LogicalPlan, Expression) = {
    // narrower integral values are widened to the scan's Long domain in
    // a Project BELOW the scan; the helper column never escapes (the
    // outer Project re-selects only child.output + the results)
    val (inner, value) =
      if (p.value.dataType == LongType) (plan, p.value)
      else {
        val widened =
          Alias(Cast(p.value, LongType), p.value.name + "_scanl")()
        (Project(plan.output :+ widened, plan),
          widened.toAttribute): (LogicalPlan, CAttr)
      }
    val g = GlobalScanPlan(p.order, value, inner, p.ansi, p.kind, p.range)
    // min/max over an integral column keep its type (min(int) is int):
    // narrow the scan's long back so the output schema is unchanged —
    // values are original column values, the downcast cannot overflow
    val result: Expression =
      if (g.scanAttr.dataType == p.alias.dataType) g.scanAttr
      else Cast(g.scanAttr, p.alias.dataType)
    (g, result)
  }

  /** At most this many expressions of one window are stacked: each scan
    * persists its input across its two passes, so the rewrite costs one
    * MEMORY_AND_DISK copy per expression (only the FIRST pays the
    * exchange + sort — a scan's output keeps the range partitioning and
    * ordering, satisfying the next scan's requirements). Six covers the
    * full kind set over one window; past this, a single multi-kind pass
    * is worth building instead. */
  private val MaxStacked = 6

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case w @ Window(exprs, Seq(), _, child, _)
        if exprs.nonEmpty && exprs.size <= MaxStacked =>
      val parsed = exprs.map(parse(_, child))
      // all-or-nothing: rewriting a subset would still leave a
      // single-partition Window for the rest — no win, extra passes.
      // Frames may differ per expression (each scan carries its own);
      // the order must be shared — it is what the one sort provides.
      val orders = parsed.flatten.map(_.order).distinct
      if (parsed.exists(_.isEmpty) || orders.size != 1) w
      else {
        var acc: LogicalPlan = child
        val results = parsed.flatten.map { p =>
          val (next, result) = stack(acc, p)
          acc = next
          (p.alias, result)
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
