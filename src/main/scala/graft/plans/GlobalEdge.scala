package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BoundReference, GenericInternalRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** GLOBAL EDGE-VALUE WINDOW — `first_value` / `last_value` / `nth_value`
  * over a total order, with NO single-partition stage: the fourth member
  * of the two-pass family (GlobalRank: positions, GlobalTies: tie ranks,
  * GlobalScan: prefix aggregates, GlobalShift: fixed-distance shifts,
  * here: frame-edge values).
  *
  * An un-partitioned `first_value(x)` / `nth_value(x, n)` /
  * `last_value(x)` window plans in Spark as a single-partition WindowExec
  * even though the value each row needs is either (a) a SINGLE globally
  * fixed row — the first / n-th qualifying row of the whole ordering —
  * or (b) a row at the END of the current frame, reachable from
  * per-partition boundary state. Both reduce to the family's partials
  * mechanism:
  *
  *   1. the input is total-ordered by range partitioning (planned sort);
  *   2. pass 1 ships per partition: row count, the first min(n, present)
  *      qualifying values with their local positions ([[EdgeKind.At]]),
  *      the last non-null value ([[EdgeKind.LastNonNull]]), and — for the
  *      default RANGE frame — first/last row copies plus the leading
  *      tie-run's length and edge values, so a peer group spanning
  *      partitions can be completed without seeing its interior;
  *   3. the driver splices the n-th qualifying row's GLOBAL position and
  *      value (At), each partition's carried-in "latest non-null"
  *      (LastNonNull), and the trailing-group completion chain (RANGE) —
  *      O(numPartitions) work on single-column values — and broadcasts;
  *   4. pass 2 streams each partition once (ROWS) or buffers one peer
  *      group at a time (RANGE — the same bounded buffer WindowExec keeps
  *      for a RANGE frame, distributed instead of all rows in one task).
  *
  * The kinds cover every analyzer shape of the three functions over the
  * running frames (UNBOUNDED PRECEDING .. CURRENT ROW, ROWS or the
  * default RANGE):
  *
  *   - `first_value(x)` respect-nulls = the globally first row's value —
  *     [[EdgeKind.At]](1) (the frame always contains row 1);
  *   - `first_value(x [IGNORE NULLS])` = the first NON-NULL value once
  *     the frame reaches it — At(1, ignoreNulls = true);
  *   - `nth_value(x, n)` = the n-th qualifying row's value once the frame
  *     contains it, NULL before — At(n, ·);
  *   - `last_value(x)` over ROWS = the current row's value — rewritten by
  *     [[GlobalEdgeRule]] to a plain Project, no operator at all;
  *   - `last_value(x)` over the default RANGE frame = the current PEER
  *     GROUP's last value — [[EdgeKind.LastValue]];
  *   - `last_value(x IGNORE NULLS)` = the latest non-null value at or
  *     before the frame end — [[EdgeKind.LastNonNull]].
  *
  * Values are carried as single-column UnsafeRow copies, so any data type
  * rides through (strings, decimals, structs), not just longs.
  */
sealed abstract class EdgeKind extends Serializable
object EdgeKind {
  /** Emit the value of the globally n-th QUALIFYING row (qualifying =
    * non-null under ignoreNulls, every row otherwise) to each row whose
    * frame end has reached that row; NULL before. first_value is n = 1;
    * nth_value is the general case. `n` is capped at
    * [[GlobalEdge.MaxN]] — pass 1 ships at most n values per partition. */
  case class At(n: Int, ignoreNulls: Boolean) extends EdgeKind {
    require(n > 0, "nth_value position must be positive")
  }
  /** The frame's last row's value — last_value respect-nulls over the
    * default RANGE frame: every peer shares the tie group's last value
    * (the group may span partitions; the driver chains its completion). */
  case object LastValue extends EdgeKind
  /** The latest non-null value at or before the frame end — last_value
    * IGNORE NULLS (ROWS: per row; RANGE: per peer-group end). */
  case object LastNonNull extends EdgeKind
}

object GlobalEdgePlan {
  /** Output column typed like the input; nullability per kind: At(n > 1)
    * and ignore-nulls kinds can emit NULL before the n-th qualifying row
    * exists even over a non-nullable input; At(1) respect-nulls always
    * has a frame containing row 1, so it is exactly as nullable as the
    * input; LastValue emits a real row's value. */
  def apply(order: Seq[SortOrder], kind: EdgeKind, range: Boolean,
            input: Attribute, child: LogicalPlan): GlobalEdgePlan = {
    val nullable = kind match {
      case EdgeKind.At(1, false) => input.nullable
      case EdgeKind.LastValue => input.nullable
      case _ => true
    }
    GlobalEdgePlan(order, kind, range, input, child,
      AttributeReference("edge", input.dataType, nullable)())
  }
}

case class GlobalEdgePlan(order: Seq[SortOrder], kind: EdgeKind,
    range: Boolean, input: Attribute, child: LogicalPlan,
    // constructor field (not a body val) so copy()/transform preserve the
    // exprId — a body val would mint a fresh attribute on every tree copy
    edgeAttr: AttributeReference)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ edgeAttr
  override def producedAttributes
  : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(edgeAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
  : GlobalEdgePlan = copy(child = newChild)
}

case class GlobalEdgeExec(order: Seq[SortOrder], kind: EdgeKind,
    range: Boolean, input: Attribute, edgeAttr: Attribute,
    child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ edgeAttr

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

  import GlobalEdgeExec.{EdgeChain, EdgePartial}

  override protected def doExecute(): RDD[InternalRow] = {
    val ordinal = child.output.indexWhere(_.exprId == input.exprId)
    require(ordinal >= 0, s"edge column $input not in child output")
    val valueType = input.dataType
    val valueNullable = input.nullable
    val theKind = kind // stable locals for task closures
    val isRange = range
    val orderLocal = order
    val childOutput = child.output
    // how many qualifying head values pass 1 must keep per partition
    val need = theKind match {
      case EdgeKind.At(n, _) => n
      case _ => 0
    }
    val qualifiesNonNull = theKind match {
      case EdgeKind.At(_, ig) => ig
      case _ => false
    }
    val wantLastNonNull = theKind == EdgeKind.LastNonNull
    // same persist rationale as the siblings: the sorted child feeds two
    // passes; the exchange is reused but the post-shuffle sort is not,
    // and both passes must see the identical row order (rows copied —
    // operators reuse mutable UnsafeRow buffers)
    val inputRdd = child.execute()
      .mapPartitions(it => it.map(_.copy()), preservesPartitioning = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: constant-size partials per partition (at most `need`
    // single-column values plus two boundary rows)
    val partials = inputRdd.mapPartitions({ it =>
      val proj = UnsafeProjection.create(
        Seq(BoundReference(ordinal, valueType, valueNullable)))
      val cmp = if (isRange) RowOrdering.create(orderLocal, childOutput)
        else null
      var count = 0L
      val headPos = new scala.collection.mutable.ArrayBuffer[Long]
      val headVal = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
      var lastNonNull: UnsafeRow = null
      var first: InternalRow = null; var prev: InternalRow = null
      var leading = true; var leadEq = 0L
      var leadLastVal: UnsafeRow = null
      var leadLastNonNull: UnsafeRow = null
      it.foreach { row =>
        if (isRange) {
          // leading iff the row ties the partition's FIRST row (ties are
          // transitive under compare == 0)
          if (first == null) first = row
          else if (leading && cmp.compare(first, row) != 0) leading = false
          prev = row
          if (leading) {
            leadEq += 1L
            leadLastVal = proj(row).copy()
            if (!leadLastVal.isNullAt(0)) leadLastNonNull = leadLastVal
          }
        }
        val isNull = valueNullable && row.isNullAt(ordinal)
        if (headVal.length < need && (!qualifiesNonNull || !isNull)) {
          headPos += count
          headVal += proj(row).copy()
        }
        if (wantLastNonNull && !isNull) lastNonNull = proj(row).copy()
        count += 1L
      }
      Iterator.single(EdgePartial(count, headPos.toArray, headVal.toArray,
        lastNonNull, first, prev, leadEq, leadLastVal, leadLastNonNull))
    }, preservesPartitioning = true).collect()
    val nP = partials.length
    val rowOffsets = partials.map(_.count).scanLeft(0L)(_ + _)
    // driver: splice the n-th qualifying row's global position + value.
    // A partial's head array shorter than `need` holds ALL that
    // partition's qualifying rows (the cap is min(n, present)), so the
    // walk never misses one. No n-th row in the corpus -> threshold
    // MaxValue: every row emits NULL (the frame never contains it).
    var atThreshold = Long.MaxValue
    var atValue: UnsafeRow = null
    theKind match {
      case EdgeKind.At(n, _) =>
        var qualSoFar = 0L
        var q = 0
        var found = false
        while (!found && q < nP) {
          val h = partials(q)
          val want = n - qualSoFar
          if (h.headVal.length >= want) {
            atThreshold = rowOffsets(q) + h.headPos(want.toInt - 1) + 1L
            atValue = h.headVal(want.toInt - 1)
            found = true
          } else {
            qualSoFar += h.headVal.length
            q += 1
          }
        }
      case _ =>
    }
    // driver: per-partition carried-in "latest non-null" — the nearest
    // earlier partition that saw one (nulls-only partitions are
    // transparent)
    val carryNonNull = new Array[UnsafeRow](nP)
    if (wantLastNonNull) {
      var latest: UnsafeRow = null
      var p = 0
      while (p < nP) {
        carryNonNull(p) = latest
        if (partials(p).lastNonNull != null) latest = partials(p).lastNonNull
        p += 1
      }
    }
    // RANGE: trailing-group completion per partition — chain the leading
    // runs of later partitions whose rows tie this partition's last row
    // (GlobalTiesExec's boundary chain, applied to edge values). The LAST
    // chained partition's leading-run edge is the group's true edge.
    val chains = new Array[EdgeChain](nP)
    if (isRange) {
      val cmp = RowOrdering.create(orderLocal, childOutput)
      var p = 0
      while (p < nP) {
        var len = 0L
        var lastVal: UnsafeRow = null
        var lastNonNull: UnsafeRow = null
        val pp = partials(p)
        if (pp.count > 0L) {
          var q = p + 1; var chained = true
          while (chained && q < nP) {
            val pq = partials(q)
            if (pq.count == 0L) q += 1 // empty partitions are transparent
            else if (cmp.compare(pp.last, pq.first) == 0) {
              len += pq.leadEq
              lastVal = pq.leadLastVal
              if (pq.leadLastNonNull != null) lastNonNull = pq.leadLastNonNull
              // the chain continues past q only if ALL of q is one group
              chained = pq.leadEq == pq.count
              q += 1
            } else chained = false
          }
        }
        chains(p) = EdgeChain(len, lastVal, lastNonNull)
        p += 1
      }
    }
    val bc = inputRdd.sparkContext.broadcast(
      (rowOffsets, atThreshold, atValue, carryNonNull, chains))
    // pass 2: emit through an UnsafeProjection (created per task — it
    // holds codegen state); one scratch row per task, reused (the
    // projection copies values into its own buffer)
    val types = output.map(_.dataType).toArray
    inputRdd.mapPartitionsWithIndex({ (pid, it) =>
      val (rowOff, threshold, value, carries, chainArr) = bc.value
      val base = rowOff(pid)
      val nCols = types.length
      val proj = UnsafeProjection.create(types)
      val valueProj = UnsafeProjection.create(
        Seq(BoundReference(ordinal, valueType, valueNullable)))
      val out = new GenericInternalRow(nCols)
      def emit(row: InternalRow, edge: UnsafeRow): UnsafeRow = {
        var j = 0
        while (j < nCols - 1) { out.update(j, row.get(j, types(j))); j += 1 }
        if (edge == null || edge.isNullAt(0)) out.setNullAt(nCols - 1)
        else out.update(nCols - 1, edge.get(0, valueType))
        proj(out)
      }
      if (!isRange) theKind match {
        case EdgeKind.At(_, _) =>
          // frame end = the row itself: emit once the global position
          // reaches the spliced threshold
          var pos = base
          it.map { row =>
            pos += 1L
            emit(row, if (pos >= threshold) value else null)
          }
        case EdgeKind.LastNonNull =>
          var latest = carries(pid)
          it.map { row =>
            if (!(valueNullable && row.isNullAt(ordinal)))
              latest = valueProj(row).copy()
            emit(row, latest)
          }
        case EdgeKind.LastValue =>
          // unreachable: the rule rewrites ROWS-frame last_value to a
          // plain Project (the frame's last row IS the current row)
          it.map(row => emit(row, valueProj(row)))
      } else {
        // RANGE: buffer one peer group at a time (row references into
        // the persisted, copied input — safe to hold); every peer gets
        // the group-END edge; the partition's LAST group folds in the
        // driver-chained completion. Memory: the largest peer group —
        // the buffer WindowExec keeps for a RANGE frame, distributed.
        val chain = chainArr(pid)
        val cmp2 = RowOrdering.create(orderLocal, childOutput)
        val peers = it.buffered
        val group = new scala.collection.mutable.ArrayBuffer[InternalRow]
        var groupEdge: UnsafeRow = null
        var gi = 0
        var pos = base // global 1-based position of the last consumed row
        var latest = if (wantLastNonNull) carries(pid) else null
        new Iterator[InternalRow] {
          override def hasNext: Boolean = gi < group.length || peers.hasNext
          override def next(): InternalRow = {
            if (gi >= group.length) {
              group.clear(); gi = 0
              val head = peers.next(); group += head
              while (peers.hasNext && cmp2.compare(head, peers.head) == 0)
                group += peers.next()
              pos += group.length
              val isTrailing = !peers.hasNext
              groupEdge = theKind match {
                case EdgeKind.At(_, _) =>
                  // frame end = group end; the trailing group extends by
                  // the chained peers in later partitions
                  val endPos = pos + (if (isTrailing) chain.len else 0L)
                  if (endPos >= threshold) value else null
                case EdgeKind.LastValue =>
                  if (isTrailing && chain.lastVal != null) chain.lastVal
                  else valueProj(group(group.length - 1)).copy()
                case EdgeKind.LastNonNull =>
                  var j = 0
                  while (j < group.length) {
                    val r = group(j)
                    if (!(valueNullable && r.isNullAt(ordinal)))
                      latest = valueProj(r).copy()
                    j += 1
                  }
                  // chained peers come AFTER the local rows in the total
                  // order, so their last non-null (if any) wins
                  if (isTrailing && chain.lastNonNull != null)
                    chain.lastNonNull
                  else latest
              }
            }
            val row = group(gi); gi += 1
            emit(row, groupEdge)
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
  : GlobalEdgeExec = copy(child = newChild)
}

object GlobalEdgeExec {
  /** Per-partition pass-1 summary. `headPos`/`headVal` are the first
    * min(n, present) QUALIFYING rows' local positions and value copies;
    * `lastNonNull` the partition's last non-null value (null if none);
    * `first`/`last` row copies and the `lead*` fields describe the
    * leading tie-run (RANGE frames only — null/0 otherwise). Top-level
    * (not nested in the exec) so task closures don't drag the SparkPlan
    * in. */
  private[plans] case class EdgePartial(count: Long, headPos: Array[Long],
      headVal: Array[UnsafeRow], lastNonNull: UnsafeRow,
      first: InternalRow, last: InternalRow, leadEq: Long,
      leadLastVal: UnsafeRow, leadLastNonNull: UnsafeRow)

  /** Driver-chained completion of a partition's trailing peer group:
    * how many later-partition rows tie its last row (`len`), the chained
    * group's true last value, and its last non-null value (nulls mean
    * "no contribution"). */
  private[plans] case class EdgeChain(len: Long, lastVal: UnsafeRow,
      lastNonNull: UnsafeRow)
}

object GlobalEdgeStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalEdgePlan =>
      GlobalEdgeExec(g.order, g.kind, g.range, g.input, g.edgeAttr,
        org.apache.spark.sql.execution.PlanLater(g.child)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: rewrite un-partitioned `first_value` / `last_value` /
  * `nth_value` windows over the running frames (ROWS or the default
  * RANGE, UNBOUNDED PRECEDING .. CURRENT ROW) into [[GlobalEdgePlan]] —
  * or, for ROWS-frame respect-nulls last_value, into a plain Project
  * (the frame's last row IS the current row). Same fallbacks as the
  * siblings: partitioned windows parallelize on their own and
  * LIMIT-bounded inputs are provably tiny — both keep WindowExec. No
  * top-k suppression is needed: InferWindowGroupLimit cannot prune on
  * these functions, so a rank-limit Filter above never makes the
  * single-partition WindowExec preferable. */
object GlobalEdgeRule
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias,
    Attribute => CAttr, CurrentRow, Expression, IntegerLiteral, NthValue,
    RangeFrame, RowFrame, SpecifiedWindowFrame, UnboundedPreceding,
    WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, First, Last}
  import org.apache.spark.sql.catalyst.plans.logical.{Project, Window}

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case w @ Window(Seq(a @ Alias(WindowExpression(fn,
          WindowSpecDefinition(Seq(), order,
            SpecifiedWindowFrame(ft, UnboundedPreceding, CurrentRow))), name)),
        Seq(), _, child, _)
        if order.nonEmpty && (ft == RowFrame || ft == RangeFrame) &&
          !GlobalRankRule.isLimitBounded(child) =>
      val range = ft == RangeFrame
      // the aggregate-shaped functions arrive wrapped in an
      // AggregateExpression (plain: non-distinct, unfiltered); nth_value
      // is an AggregateWindowFunction and arrives bare
      val parsed: Option[Either[CAttr, (EdgeKind, CAttr)]] = fn match {
        case AggregateExpression(First(v: CAttr, ignoreNulls), _, false,
            None, _) =>
          Some(Right((EdgeKind.At(1, ignoreNulls), v)))
        case AggregateExpression(Last(v: CAttr, false), _, false, None, _) =>
          // ROWS: the frame ends at the current row — last_value IS the
          // input column; RANGE: the peer group's last value
          if (range) Some(Right((EdgeKind.LastValue, v)))
          else Some(Left(v))
        case AggregateExpression(Last(v: CAttr, true), _, false, None, _) =>
          Some(Right((EdgeKind.LastNonNull, v)))
        case NthValue(v: CAttr, IntegerLiteral(n), ignoreNulls)
            if n > 0 && n <= GlobalEdge.MaxN =>
          Some(Right((EdgeKind.At(n, ignoreNulls), v)))
        case _ => None
      }
      parsed.map {
        case Left(v) =>
          Project(child.output :+
            Alias(v, name)(exprId = a.exprId, qualifier = a.qualifier,
              explicitMetadata = a.explicitMetadata),
            child): LogicalPlan
        case Right((kind, v)) =>
          val g = GlobalEdgePlan(order, kind, range, v, child)
          Project(child.output :+
            Alias(g.edgeAttr, name)(exprId = a.exprId,
              qualifier = a.qualifier,
              explicitMetadata = a.explicitMetadata),
            g): LogicalPlan
      }.getOrElse(w)
  }
}

object GlobalEdge {
  /** nth_value positions beyond this keep WindowExec: pass 1 ships up to
    * n single-column values per partition, and a frame edge thousands of
    * rows deep is no longer "a fixed small position" (same contract as
    * [[GlobalShift.MaxOffset]]). */
  val MaxN = 1024

  def ensureStrategy(spark: SparkSession): Unit =
    SessionHooks.ensureStrategy(spark, GlobalEdgeStrategy)

  /** Register [[GlobalEdgeRule]] (+ its strategy) on a session,
    * idempotently. */
  def ensureRule(spark: SparkSession): Unit =
    SessionHooks.ensureRule(spark, GlobalEdgeRule, GlobalEdgeStrategy)

  /** Undo [[ensureRule]] (tests; a production session keeps it). */
  def removeRule(spark: SparkSession): Unit =
    SessionHooks.removeRule(spark, GlobalEdgeRule)
}
