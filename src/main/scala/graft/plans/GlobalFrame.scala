package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BoundReference, GenericInternalRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** GLOBAL SLIDING FRAME — `agg(x) OVER (ORDER BY ... ROWS BETWEEN k
  * PRECEDING AND CURRENT ROW)` with NO PARTITION BY, and NO
  * single-partition stage: the bounded-frame member of the two-pass
  * family (GlobalRank: positions, GlobalTies: tie ranks, GlobalScan:
  * prefix aggregates, GlobalShift: row offsets, GlobalEdge: frame edges,
  * here: sliding aggregates).
  *
  * Spark plans an un-partitioned sliding window as one WindowExec on one
  * partition, even though each output row depends on at most k preceding
  * rows. After range partitioning those rows are either local or within
  * k rows of the partition boundary — the same locality GlobalShift
  * exploits, generalized from one offset row to a k-row frame:
  *
  *   1. the input is total-ordered by range partitioning (planned sort);
  *   2. pass 1 captures each partition's LAST min(k, count) value rows —
  *      at most k narrow rows per partition to the driver;
  *   3. the driver splices, per partition, the exact k rows preceding
  *      its first row (walking across short/empty partitions — an array
  *      shorter than k means that partition was captured whole, so the
  *      walk is always safe), and broadcasts them;
  *   4. pass 2 streams each partition once behind a (k+1)-slot ring
  *      buffer seeded from the boundary, emitting every aggregate of the
  *      current frame per row.
  *
  * Per-row cost, per aggregate: count / count(*) / legacy sum are O(1)
  * (enter/exit deltas — wrapping long arithmetic is a ring, so
  * subtract-on-exit is exact); min/max are amortized O(1) via a monotonic
  * deque (dominated candidates never resurface); ANSI sum and avg
  * re-fold the frame in order, O(k) — ANSI sum must raise exactly when
  * the native window's in-order partial sum overflows, and avg must
  * reproduce the native Average's in-frame-order Double accumulation
  * bit-for-bit (Spark's SlidingWindowFunctionFrame recomputes the buffer
  * per slide the same way). k is capped at [[GlobalFrame.MaxFrame]] — the
  * boundary state is k narrow rows per partition, and a frame wider than
  * that is no longer "a small bounded neighborhood" (WindowExec keeps
  * those).
  *
  * Aggregate kinds, value typing, widening and result nullability are
  * shared with GlobalScan ([[ScanKind]]): sums/avgs run on Long (the rule
  * widens integral inputs below the plan), extrema fold any orderable
  * type under its interpreted ordering, counts never touch the value.
  */
case class FrameSpec(kind: ScanKind, k: Int, ansi: Boolean)
  extends Serializable {
  require(k >= 0, s"frame must reach backward: k = $k")
}

// Output type/nullability mirror the window aggregate this replaces —
// same derivation as GlobalScanPlan (the frame always contains the
// current row, so sum/min/max/avg are null exactly when every value in
// the frame is null, i.e. nullable iff the value column is). Constructor
// field, not a body val: copy()/transform preserve the exprIds.
object GlobalFramePlan {
  def apply(order: Seq[SortOrder], specs: Seq[FrameSpec],
            values: Seq[Attribute], child: LogicalPlan): GlobalFramePlan = {
    require(specs.nonEmpty, "GlobalFramePlan needs at least one spec")
    require(specs.length == values.length,
      "one value column per spec (a placeholder for count(*))")
    val attrs = specs.zip(values).map { case (sp, value) =>
      if (sp.kind == ScanKind.Sum || sp.kind == ScanKind.Avg)
        require(value.dataType == LongType,
          s"${sp.kind.sql} needs a LongType value column, got " +
            s"${value.dataType} (the rule widens integral inputs)")
      val (dt, nullable) = sp.kind match {
        case ScanKind.Count | ScanKind.Rows =>
          (LongType: org.apache.spark.sql.types.DataType, false)
        case ScanKind.Avg =>
          (org.apache.spark.sql.types.DoubleType, value.nullable)
        case ScanKind.Min | ScanKind.Max => (value.dataType, value.nullable)
        case _ => (LongType, value.nullable)
      }
      AttributeReference("frame", dt, nullable)()
    }
    GlobalFramePlan(order, specs, values, child, attrs)
  }

  /** Single-aggregate convenience (the [[GlobalFrame.trailing]] entry
    * point and tests). */
  def apply(order: Seq[SortOrder], value: Attribute, child: LogicalPlan,
            k: Int, kind: ScanKind, ansi: Boolean): GlobalFramePlan =
    apply(order, Seq(FrameSpec(kind, k, ansi)), Seq(value), child)
}

// `values` is a first-class Seq[Attribute] field (not folded into the
// specs) so the planner's expression traversal sees it: column pruning
// keeps the inputs alive and transformExpressions rewrites their exprIds.
case class GlobalFramePlan(order: Seq[SortOrder], specs: Seq[FrameSpec],
    values: Seq[Attribute], child: LogicalPlan,
    frameAttrs: Seq[AttributeReference])
  extends UnaryNode {
  /** head output attribute — single-aggregate callers */
  def frameAttr: AttributeReference = frameAttrs.head
  override def output: Seq[Attribute] = child.output ++ frameAttrs
  override def producedAttributes
  : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(frameAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
  : GlobalFramePlan = copy(child = newChild)
}

case class GlobalFrameExec(order: Seq[SortOrder], specs: Seq[FrameSpec],
    values: Seq[Attribute], frameAttrs: Seq[Attribute], child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output ++ frameAttrs

  override def requiredChildDistribution
  : Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  // per-partition 1:1 operator: rows never move, so the child's (range)
  // partitioning survives — without this the default UnknownPartitioning
  // makes EnsureRequirements re-shuffle every consumer that wants the
  // same distribution (e.g. a GlobalScan stacked below this node)
  override def outputPartitioning
  : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val nSpecs = specs.length
    val ords = values.map(v =>
      child.output.indexWhere(_.exprId == v.exprId)).toArray
    values.zip(ords).foreach { case (v, o) =>
      require(o >= 0, s"value column $v not in child output") }
    val dts = values.map(_.dataType).toArray
    // one projected field PER SPEC (count(*)'s placeholder included —
    // never evaluated, but a uniform row layout keeps field index ==
    // spec index everywhere)
    val bounds = ords.indices.map(i =>
      BoundReference(ords(i), dts(i), nullable = values(i).nullable))
    val kinds = specs.map(_.kind).toArray
    val ks = specs.map(_.k).toArray
    val ansis = specs.map(_.ansi).toArray
    val maxK = ks.max
    val width = maxK + 1

    // same persist rationale as the siblings: the sorted child feeds two
    // passes, and both must see identical row order (rows copied —
    // operators reuse mutable UnsafeRow buffers)
    val input = child.execute()
      .mapPartitions(it => it.map(_.copy()), preservesPartitioning = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // pass 1: each partition's LAST min(maxK, count) value rows, in row
    // order (ring capture, then unroll) — narrow rows only
    val partials: Array[Array[UnsafeRow]] = input.mapPartitions({ it =>
      val proj = UnsafeProjection.create(bounds)
      val ring = new Array[UnsafeRow](math.max(maxK, 1))
      var count = 0L
      it.foreach { row =>
        if (maxK > 0) ring((count % maxK).toInt) = proj(row).copy()
        count += 1L
      }
      val m = math.min(count, maxK.toLong).toInt
      val tail = new Array[UnsafeRow](m)
      var j = 0
      while (j < m) { tail(j) = ring(((count - m + j) % maxK).toInt); j += 1 }
      Iterator.single(tail)
    }, preservesPartitioning = true).collect()

    // driver: per partition, the maxK rows immediately preceding its
    // first row, walking back across partitions shorter than maxK (an
    // array shorter than maxK means that partition was captured WHOLE, so
    // skipping past it never loses an in-range row). A spliced boundary
    // shorter than maxK means the corpus genuinely starts within maxK
    // rows — pass 2 reads that as "frame truncated at corpus start".
    val parts = partials.length
    val boundaries = new Array[Array[UnsafeRow]](parts)
    var p = 0
    while (p < parts) {
      val acc = new scala.collection.mutable.ArrayDeque[UnsafeRow]()
      var need = maxK
      var q = p - 1
      while (need > 0 && q >= 0) {
        val t = partials(q)
        val take = math.min(need, t.length)
        var j = take - 1
        while (j >= 0) { acc.prepend(t(t.length - take + j)); j -= 1 }
        need -= take
        q -= 1
      }
      boundaries(p) = acc.toArray
      p += 1
    }
    val bc = input.sparkContext.broadcast(boundaries)

    // pass 2: one streaming pass per partition behind a ring of the last
    // width = maxK+1 value rows. Boundary rows are PUSHED (state warm-up)
    // but not emitted; every local row pushes, then emits.
    val types = output.map(_.dataType).toArray
    input.mapPartitionsWithIndex({ (pid, it) =>
      val boundary = bc.value(pid)
      val nCols = types.length
      val outProj = UnsafeProjection.create(types)
      val valueProj = UnsafeProjection.create(bounds)
      val out = new GenericInternalRow(nCols)
      val ring = new Array[UnsafeRow](width)
      // pushed index of the most recent entry; frames live in pushed
      // space, which equals corpus space truncated to the last maxK rows
      // (exactly the window any frame can reach)
      var last = -1L

      // per-spec incremental state + evaluation gates
      val cnt = new Array[Long](nSpecs)  // non-null values in frame
      val wsum = new Array[Long](nSpecs) // wrapping frame sum (legacy)
      val isExt = kinds.map(kd => kd == ScanKind.Min || kd == ScanKind.Max)
      val isMin = kinds.map(_ == ScanKind.Min)
      val incremental = Array.tabulate(nSpecs)(i =>
        kinds(i) == ScanKind.Count ||
          (kinds(i) == ScanKind.Sum && !ansis(i)))
      val incSum = Array.tabulate(nSpecs)(i =>
        kinds(i) == ScanKind.Sum && !ansis(i))
      // interpreted orderings for the extremum deques (DataType ships
      // fine; the ordering itself is built per task)
      val gord = Array.tabulate(nSpecs)(i =>
        if (isExt(i))
          org.apache.spark.sql.catalyst.util.TypeUtils
            .getInterpretedOrdering(dts(i))
        else null)
      // monotonic deques: (pushed index, boxed value), indexes strictly
      // increasing front to back, values strictly improving toward the
      // front in the spec's direction. Values are extracted at push time
      // from that push's own row copy, so later ring-slot reuse never
      // invalidates them.
      val deques = Array.fill(nSpecs)(
        new scala.collection.mutable.ArrayDeque[(Long, Any)]())

      def push(vrow: UnsafeRow): Unit = {
        last += 1L
        // exits first: for k == maxK the departing entry lives in
        // EXACTLY the ring slot this push reuses — read before overwrite
        var i = 0
        while (i < nSpecs) {
          if (incremental(i)) {
            val dep = last - ks(i) - 1L
            if (dep >= 0L) {
              val drow = ring((dep % width).toInt)
              if (!drow.isNullAt(i)) {
                cnt(i) -= 1L
                if (incSum(i)) wsum(i) -= drow.getLong(i)
              }
            }
          }
          i += 1
        }
        ring((last % width).toInt) = vrow
        i = 0
        while (i < nSpecs) {
          if (incremental(i) && !vrow.isNullAt(i)) {
            cnt(i) += 1L
            if (incSum(i)) wsum(i) += vrow.getLong(i)
          }
          if (isExt(i) && !vrow.isNullAt(i)) {
            val v = vrow.get(i, dts(i))
            val dq = deques(i)
            val ord = gord(i)
            // a back entry the new value ties-or-beats can never be the
            // frame extremum again (the new value is newer AND as good)
            while (dq.nonEmpty && {
              val c = ord.compare(dq.last._2, v)
              if (isMin(i)) c >= 0 else c <= 0
            }) dq.removeLast()
            dq.append((last, v))
          }
          i += 1
        }
      }

      def emit(row: InternalRow): UnsafeRow = {
        val base = nCols - nSpecs
        var j = 0
        while (j < base) { out.update(j, row.get(j, types(j))); j += 1 }
        var i = 0
        while (i < nSpecs) {
          val col = base + i
          kinds(i) match {
            case ScanKind.Rows =>
              out.update(col, math.min(ks(i) + 1L, last + 1L))
            case ScanKind.Count =>
              out.update(col, cnt(i))
            case ScanKind.Sum if !ansis(i) =>
              if (cnt(i) == 0L) out.setNullAt(col)
              else out.update(col, wsum(i))
            case ScanKind.Sum => // ANSI: exact in-order re-fold — must
              // raise exactly when the native window's in-order frame
              // partial overflows (enter/exit deltas could overflow the
              // accumulator on frames whose own sum is in range)
              var s = 0L; var any = false
              var idx = math.max(0L, last - ks(i))
              while (idx <= last) {
                val r = ring((idx % width).toInt)
                if (!r.isNullAt(i)) {
                  s = Math.addExact(s, r.getLong(i)); any = true
                }
                idx += 1L
              }
              if (any) out.update(col, s) else out.setNullAt(col)
            case ScanKind.Avg =>
              // native parity: window Average accumulates the frame in
              // Double, in frame order, recomputed per slide
              // (SlidingWindowFunctionFrame) — reproduce bit-for-bit
              var d = 0.0; var c = 0L
              var idx = math.max(0L, last - ks(i))
              while (idx <= last) {
                val r = ring((idx % width).toInt)
                if (!r.isNullAt(i)) { d += r.getLong(i); c += 1L }
                idx += 1L
              }
              if (c > 0L) out.update(col, d / c) else out.setNullAt(col)
            case _ => // Min | Max: expire, then read the front
              val dq = deques(i)
              val lo = last - ks(i)
              while (dq.nonEmpty && dq.head._1 < lo) dq.removeHead()
              if (dq.isEmpty) out.setNullAt(col)
              else out.update(col, dq.head._2)
          }
          i += 1
        }
        outProj(out)
      }

      boundary.foreach(push)
      it.map { row =>
        push(valueProj(row).copy())
        emit(row)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
  : GlobalFrameExec = copy(child = newChild)
}

object GlobalFrameStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalFramePlan =>
      GlobalFrameExec(g.order, g.specs, g.values, g.frameAttrs,
        org.apache.spark.sql.execution.PlanLater(g.child)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: rewrite an un-partitioned Window whose expressions are
  * bounded trailing-frame aggregates (`ROWS BETWEEN k PRECEDING AND
  * CURRENT ROW`, k <= [[GlobalFrame.MaxFrame]]) — optionally MIXED with
  * prefix aggregates from GlobalScan's domain (`ROWS/RANGE UNBOUNDED
  * PRECEDING`, the everyday "running total + moving average" dashboard)
  * — into [[GlobalFramePlan]] stacked on [[GlobalScanPlan]] over ONE
  * shared range sort. All-or-nothing, same rationale as GlobalScanRule:
  * rewriting a subset would still leave a single-partition Window for
  * the rest. Partitioned windows parallelize on their own and
  * LIMIT-bounded inputs are provably tiny — both keep WindowExec. */
object GlobalFrameRule
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias,
    Attribute => CAttr, Cast, CurrentRow, Expression, IntegerLiteral,
    NamedExpression, RowFrame, SpecifiedWindowFrame, UnaryMinus,
    WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
  import org.apache.spark.sql.catalyst.plans.logical.{Project, Window}

  /** `k PRECEDING` as Catalyst encodes it: a negative literal (DataFrame
    * `rowsBetween(-k, 0)`, or SQL after constant folding), the parser's
    * still-unfolded `UnaryMinus(k)`, or `CurrentRow` (the degenerate
    * k = 0 frame — `rowsBetween(0, 0)` encodes its lower bound as
    * CurrentRow, not a literal). */
  private object KPreceding {
    def unapply(e: Expression): Option[Int] = e match {
      case IntegerLiteral(n) if n < 0 && n != Int.MinValue => Some(-n)
      case UnaryMinus(IntegerLiteral(n), _) if n > 0 => Some(n)
      case CurrentRow => Some(0)
      case _ => None
    }
  }

  private case class FParsed(alias: Alias, order: Seq[SortOrder], k: Int,
      kind: ScanKind, value: CAttr, ansi: Boolean, widen: Boolean)

  private def parseFrame(e: NamedExpression,
                         child: org.apache.spark.sql.catalyst.plans
                           .logical.LogicalPlan): Option[FParsed] = e match {
    case a @ Alias(WindowExpression(agg: AggregateExpression,
          WindowSpecDefinition(Seq(), order,
            SpecifiedWindowFrame(RowFrame, KPreceding(k), CurrentRow))),
        _) if order.nonEmpty && !agg.isDistinct && agg.filter.isEmpty &&
          k <= GlobalFrame.MaxFrame =>
      GlobalScanRule.scannable(agg, child).map { case (kind, v, ansi,
          widen) => FParsed(a, order, k, kind, v, ansi, widen) }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case w @ Window(exprs, Seq(), _, child, _) if exprs.nonEmpty =>
      val framed = exprs.map(parseFrame(_, child))
      if (!framed.exists(_.isDefined)) w // no bounded frame: not ours
      else {
        // every non-frame expression must be a rewritable PREFIX
        // aggregate (GlobalScan's parser) sharing the same order
        val prefixes = exprs.zip(framed).map { case (e, f) =>
          if (f.isDefined) None else GlobalScanRule.parse(e, child) }
        val unmatched = exprs.indices.exists(i =>
          framed(i).isEmpty && prefixes(i).isEmpty)
        val orders = (framed.flatten.map(_.order) ++
          prefixes.flatten.map(_.order)).distinct
        if (unmatched || orders.size != 1 ||
            GlobalRankRule.isLimitBounded(child)) w
        else {
          val order = orders.head
          // integral inputs of widen-marked specs are upcast to Long in
          // ONE Project below everything (deduped by exprId — a frame
          // sum and a prefix sum of the same column share the widened
          // attribute); the helpers never escape the outer Project
          val widenPairs =
            (framed.flatten.filter(_.widen).map(_.value) ++
              prefixes.flatten.filter(_.widen).map(_.value))
            .filter(_.dataType != LongType)
            .groupBy(_.exprId).map(_._2.head)
            .map(v => v.exprId ->
              Alias(Cast(v, LongType), v.name + "_framel")())
            .toMap
          val inner: LogicalPlan =
            if (widenPairs.isEmpty) child
            else Project(child.output ++ widenPairs.values, child)
          def valOf(v: CAttr, widen: Boolean): CAttr =
            if (widen) widenPairs.get(v.exprId)
              .map(_.toAttribute: CAttr).getOrElse(v)
            else v
          // prefix aggregates (if any) scan FIRST — both operators are
          // order/partitioning-preserving 1:1 nodes, so the stack shares
          // one exchange + sort and EnsureRequirements inserts nothing
          // between them
          val scanPs = prefixes.flatten
          val base: LogicalPlan =
            if (scanPs.isEmpty) inner
            else GlobalScanPlan(order,
              scanPs.map(p => ScanSpec(p.kind, p.ansi, p.range)),
              scanPs.map(p => valOf(p.value, p.widen)), inner)
          val scanAttrs = base match {
            case s: GlobalScanPlan => s.scanAttrs
            case _ => Nil
          }
          val framePs = framed.flatten
          val g = GlobalFramePlan(order,
            framePs.map(p => FrameSpec(p.kind, p.k, p.ansi)),
            framePs.map(p => valOf(p.value, p.widen)), base)
          // results in the original expression order, each narrowed back
          // to its alias type under the original exprId so downstream
          // references resolve unchanged
          var si = -1; var fi = -1
          val results = exprs.indices.map { i =>
            val (alias, attr: CAttr) = framed(i) match {
              case Some(p) => fi += 1; (p.alias, g.frameAttrs(fi))
              case None =>
                val p = prefixes(i).get; si += 1; (p.alias, scanAttrs(si))
            }
            val result: Expression =
              if (attr.dataType == alias.dataType) attr
              else Cast(attr, alias.dataType)
            Alias(result, alias.name)(exprId = alias.exprId,
              qualifier = alias.qualifier,
              explicitMetadata = alias.explicitMetadata)
          }
          Project(child.output ++ results, g): LogicalPlan
        }
      }
  }
}

object GlobalFrame {
  /** Boundary state is up to MaxFrame narrow rows per partition on the
    * driver (and a MaxFrame+1-slot ring per task); beyond this the frame
    * is no longer a small bounded neighborhood and WindowExec keeps it. */
  val MaxFrame = 1024

  def ensureStrategy(spark: SparkSession): Unit = {
    SessionHooks.ensureStrategy(spark, GlobalFrameStrategy)
    // mixed rewrites stack on GlobalScanPlan — its strategy must be
    // registered wherever this one is
    SessionHooks.ensureStrategy(spark, GlobalScanStrategy)
  }

  /** Register [[GlobalFrameRule]] (+ the strategies it plans through) on
    * a session, idempotently: un-partitioned trailing-frame windows then
    * plan as GlobalFrame automatically. */
  def ensureRule(spark: SparkSession): Unit = {
    ensureStrategy(spark)
    SessionHooks.ensureRule(spark, GlobalFrameRule, GlobalFrameStrategy)
  }

  /** Undo [[ensureRule]] (tests; a production session keeps it). */
  def removeRule(spark: SparkSession): Unit =
    SessionHooks.removeRule(spark, GlobalFrameRule)

  /** df + `trailing` column: the k-PRECEDING..CURRENT-ROW sliding `kind`
    * aggregate of `valueCol` under the total order given by `keys`
    * ((name, descending) pairs) — the scale-out replacement for
    * `agg(value).over(Window.orderBy(...).rowsBetween(-k, 0))`. */
  def trailing(df: DataFrame, valueCol: String, k: Int,
               kind: ScanKind, keys: (String, Boolean)*): DataFrame = {
    ensureStrategy(df.sparkSession)
    val plan = SessionHooks.analyzed(df)
    val value = SessionHooks.attr(plan, valueCol)
    if (kind == ScanKind.Sum || kind == ScanKind.Avg)
      require(value.dataType == LongType,
        s"trailing ${kind.sql} needs a LongType value column, got " +
          s"${value.dataType}")
    SessionHooks.ofRows(df,
      GlobalFramePlan(SessionHooks.resolveOrder(plan, keys), value, plan,
        k, kind,
        ansi = df.sparkSession.sessionState.conf.ansiEnabled))
  }
}
