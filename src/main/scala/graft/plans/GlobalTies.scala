package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, RowOrdering, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** GLOBAL RANK WITH TIES — `rank()` / `dense_rank()` / `percent_rank()` /
  * `ntile(n)` / `cume_dist()` / `row_number()` over a total order, with NO
  * single-partition stage: [[GlobalRankPlan]]'s two-pass mechanism
  * extended from gap-free row numbers to tie-aware ranks (percent_rank
  * and ntile ride along for free: both are functions of the rank / row
  * position and the global count, which the partials already carry).
  *
  * Ties make this harder than row_number: a tie group may SPAN partition
  * boundaries after range partitioning, so a row's rank can depend on rows
  * it never sees. The fix is the same partials idea as GlobalScan's
  * offsets, enriched with boundary rows:
  *
  *   1. the input is total-ordered by range partitioning (planned sort);
  *   2. pass 1 computes, per partition: row count, tie-group count,
  *      leading/trailing tie-run lengths, and COPIES OF THE FIRST AND LAST
  *      ROW — a handful of scalars plus two rows per partition to the
  *      driver, the only global state;
  *   3. the driver chains boundary comparisons (does partition p's first
  *      row tie partition p-1's last?) into three numbers per partition —
  *      row offset, rank carry (earlier-partition rows tying the first
  *      group), dense base (distinct groups before, net of shared
  *      boundary groups) — and broadcasts them;
  *   4. pass 2 re-detects tie groups locally and emits
  *      `rank = rowOffset - carry + 1` for the first group,
  *      `rowOffset + groupStart + 1` for later ones;
  *      `dense_rank = denseBase + localGroupIndex`.
  *
  * One node computes ANY NUMBER of kinds over the same order in ONE
  * pass-pair — the partials are identical for every kind, so a window
  * projecting `row_number() + rank() + dense_rank()` fuses into a single
  * persist + two passes instead of stacking three operators
  * ([[GlobalWindowRule]] relies on this). `cume_dist` is the one kind
  * that cannot fuse with the others: it plans over the REVERSED order
  * (see [[TieKind.CumeDist]]).
  *
  * Tie detection uses the ORDER's own comparator ([[RowOrdering]] over the
  * SortOrder expressions — compare == 0), not binary key equality, so SQL
  * equivalence classes (-0.0 vs 0.0, null ordering) match WindowExec's.
  */
// Serializable: kinds ride into task closures (NTile is a case CLASS —
// Java deserialization needs its superclass serializable too)
sealed abstract class TieKind(val sql: String) extends Serializable
object TieKind {
  /** ties share a rank; the next group skips past them (1,1,3) */
  case object Rank extends TieKind("rank")
  /** ties share a rank; no gaps (1,1,2) */
  case object DenseRank extends TieKind("dense_rank")
  /** plain global row position (1..n) — lets `row_number()` fuse into a
    * multi-kind ties node (the single-function rewrite keeps the lighter
    * [[GlobalRankPlan]], whose partials carry no boundary rows) */
  case object RowNum extends TieKind("row_number")
  /** (rank - 1) / (N - 1) as double, 0.0 for a single row — needs only
    * the rank plus the global count, both already in the partials */
  case object PercentRank extends TieKind("percent_rank")
  /** n near-equal row buckets 1..n: the first (N mod n) buckets get one
    * extra row — needs only the row position plus the global count */
  case class NTile(n: Int) extends TieKind("ntile") {
    require(n > 0, "ntile bucket count must be positive")
  }
  /** #{rows <= current under the USER's order} / N as double. A forward
    * scan cannot see its tie group's END, so the plan's `order` here is
    * the REVERSE of the user's: under it, rank' = 1 + #{rows strictly
    * after the current group}, giving cume_dist = (N - rank' + 1) / N.
    * The rule performs the reversal; the exec just emits the
    * complement. */
  case object CumeDist extends TieKind("cume_dist")
}

object GlobalTiesPlan {
  /** Output attributes typed per kind: ranks/buckets/positions are longs
    * (the rule narrows back to the window function's int), percent_rank
    * and cume_dist are the native double. All non-null — every row gets
    * a value. */
  def apply(order: Seq[SortOrder], kinds: Seq[TieKind],
            child: LogicalPlan): GlobalTiesPlan = {
    require(kinds.nonEmpty, "GlobalTiesPlan needs at least one kind")
    val attrs = kinds.map { kind =>
      val dt = kind match {
        case TieKind.PercentRank | TieKind.CumeDist =>
          org.apache.spark.sql.types.DoubleType
        case _ => LongType
      }
      AttributeReference("rank", dt, nullable = false)()
    }
    GlobalTiesPlan(order, kinds, child, attrs)
  }

  /** Single-kind convenience (the family rules and tests). */
  def apply(order: Seq[SortOrder], kind: TieKind,
            child: LogicalPlan): GlobalTiesPlan =
    apply(order, Seq(kind), child)
}

case class GlobalTiesPlan(order: Seq[SortOrder], kinds: Seq[TieKind],
    child: LogicalPlan,
    // constructor field (not a body val) so copy()/transform preserve the
    // exprIds — a body val would mint fresh attributes on every tree copy
    rankAttrs: Seq[AttributeReference])
  extends UnaryNode {
  /** head output attribute — single-kind callers */
  def rankAttr: AttributeReference = rankAttrs.head
  override def output: Seq[Attribute] = child.output ++ rankAttrs
  override def producedAttributes
  : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
  : GlobalTiesPlan = copy(child = newChild)
}

case class GlobalTiesExec(order: Seq[SortOrder], kinds: Seq[TieKind],
                          rankAttrs: Seq[Attribute], child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output ++ rankAttrs

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

  import GlobalTiesExec.Partial

  override protected def doExecute(): RDD[InternalRow] = {
    val orderLocal = order
    val childOutput = child.output
    // same persist rationale as GlobalRankExec: the sorted child feeds two
    // passes; the exchange is reused but the post-shuffle sort is not, and
    // both passes must see the identical row order for the group
    // structure to line up (rows copied — operators reuse UnsafeRow
    // buffers)
    val input = child.execute()
      .mapPartitions(it => it.map(_.copy()), preservesPartitioning = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: constant-size partials per partition
    val partials = input.mapPartitions({ it =>
      val cmp = RowOrdering.create(orderLocal, childOutput)
      var count = 0L; var groups = 0L
      var leadEq = 0L; var trailEq = 0L
      var first: InternalRow = null
      var prev: InternalRow = null
      var leading = true
      it.foreach { row =>
        count += 1L
        if (first == null) { first = row; groups = 1L; leadEq = 1L
          trailEq = 1L }
        else if (cmp.compare(prev, row) == 0) {
          if (leading) leadEq += 1L
          trailEq += 1L
        } else { leading = false; groups += 1L; trailEq = 1L }
        prev = row
      }
      Iterator.single(Partial(count, groups, leadEq, trailEq, first, prev))
    }, preservesPartitioning = true).collect()

    // driver: chain boundaries into (rowOffset, rankCarry, denseBase) per
    // partition. All O(numPartitions) work on a few rows — no data moves.
    val cmp = RowOrdering.create(orderLocal, childOutput)
    val n = partials.length
    val rowOffsets = partials.map(_.count).scanLeft(0L)(_ + _)
    val rankCarry = new Array[Long](n)
    val denseBase = new Array[Long](n)
    var distinctSoFar = 0L       // distinct groups in partitions < p
    var prevNonEmpty = -1        // last non-empty partition before p
    var p = 0
    while (p < n) {
      val part = partials(p)
      if (part.count > 0L) {
        // shared: does this partition's first group continue the previous
        // non-empty partition's last group?
        val shared = prevNonEmpty >= 0 &&
          cmp.compare(partials(prevNonEmpty).last, part.first) == 0
        // rank carry: rows in earlier partitions tying our first row —
        // walk back through trailing runs while they span whole
        // partitions (a partition that is entirely one tie group passes
        // the chain through)
        var carry = 0L
        if (shared) {
          var q = prevNonEmpty
          var chained = true
          while (chained && q >= 0) {
            val pq = partials(q)
            if (pq.count == 0L) q -= 1 // empty partitions are transparent
            else if (cmp.compare(pq.last, part.first) == 0) {
              carry += pq.trailEq
              chained = pq.trailEq == pq.count
              q -= 1
            } else chained = false
          }
        }
        rankCarry(p) = carry
        denseBase(p) = distinctSoFar - (if (shared) 1L else 0L)
        distinctSoFar += part.groups - (if (shared) 1L else 0L)
        prevNonEmpty = p
      }
      p += 1
    }
    val bc = input.sparkContext.broadcast((rowOffsets, rankCarry, denseBase))
    val theKinds = kinds.toArray // stable local for task closures
    val nKinds = theKinds.length
    val totalRows = rowOffsets.last
    // pass 2: re-detect local groups ONCE per row, emit every kind's
    // value through an UnsafeProjection (created per task — it holds
    // codegen state)
    val types = output.map(_.dataType).toArray
    input.mapPartitionsWithIndex({ (pid, it) =>
      val (rowOff, carryArr, denseArr) = bc.value
      val cmp2 = RowOrdering.create(orderLocal, childOutput)
      val base = rowOff(pid)
      val carry = carryArr(pid)
      val dBase = denseArr(pid)
      // ntile bucket geometry from the global count, per ntile kind: the
      // first `rem` buckets hold `big` rows, the rest hold big - 1
      // (Spark/SQL semantics). When N < n every row is its own bucket
      // and the small-bucket arm is unreachable (no division by zero).
      val ntileBig = new Array[Long](nKinds)
      val ntileRem = new Array[Long](nKinds)
      var ki = 0
      while (ki < nKinds) {
        theKinds(ki) match {
          case TieKind.NTile(nb) =>
            ntileBig(ki) =
              totalRows / nb + (if (totalRows % nb > 0) 1L else 0L)
            ntileRem(ki) = totalRows % nb
          case _ =>
        }
        ki += 1
      }
      val nCols = types.length
      val colBase = nCols - nKinds
      val proj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(types)
      val out = new GenericInternalRow(nCols)
      var prev: InternalRow = null
      var localIdx = -1L   // 0-based row index within the partition
      var groupIdx = 0L    // 1-based tie-group index within the partition
      var groupStart = 0L  // local index of the current group's first row
      it.map { row =>
        localIdx += 1L
        if (prev == null || cmp2.compare(prev, row) != 0) {
          groupIdx += 1L
          groupStart = localIdx
        }
        prev = row
        // tie rank: first group continues the earlier partitions' value
        def rank: Long =
          if (groupIdx == 1L) base - carry + 1L
          else base + groupStart + 1L
        var j = 0
        while (j < colBase) { out.update(j, row.get(j, types(j))); j += 1 }
        var i = 0
        while (i < nKinds) {
          val value: Any = theKinds(i) match {
            case TieKind.Rank => rank
            case TieKind.DenseRank => dBase + groupIdx
            case TieKind.RowNum => base + localIdx + 1L
            case TieKind.PercentRank =>
              if (totalRows <= 1L) 0.0
              else (rank - 1L).toDouble / (totalRows - 1L).toDouble
            // this operator's order is the REVERSE of the user's window
            // order (see TieKind.CumeDist): rank here counts the strictly-
            // greater groups, so the complement is #{rows <= current}
            case TieKind.CumeDist =>
              (totalRows - rank + 1L).toDouble / totalRows.toDouble
            case TieKind.NTile(nb) =>
              val i0 = base + localIdx // global 0-based row position
              if (i0 < ntileRem(i) * ntileBig(i)) i0 / ntileBig(i) + 1L
              else ntileRem(i) + (i0 - ntileRem(i) * ntileBig(i)) /
                (totalRows / nb) + 1L
          }
          out.update(colBase + i, value)
          i += 1
        }
        proj(out)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
  : GlobalTiesExec = copy(child = newChild)
}

object GlobalTiesExec {
  /** Per-partition pass-1 summary. `first`/`last` are row COPIES (null on
    * an empty partition); the tie-run lengths let the driver chain groups
    * across boundaries without seeing any interior row. Top-level (not
    * nested in the exec) so task closures don't drag the SparkPlan in. */
  private[plans] case class Partial(count: Long, groups: Long, leadEq: Long,
      trailEq: Long, first: InternalRow, last: InternalRow)
}

// Planned by [[GlobalRankStrategy]] — the rank family (row_number, rank,
// dense_rank) shares one strategy so every existing registration site
// (GraftExtensions, SessionHooks.ensureRule callers) covers all three.
