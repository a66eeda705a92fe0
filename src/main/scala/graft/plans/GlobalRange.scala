package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BoundReference, Cast, GenericInternalRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** GLOBAL VALUE-RANGE FRAME — `agg(x) OVER (ORDER BY k RANGE BETWEEN lo
  * AND hi)` for bounded VALUE offsets over a numeric ORDER BY (trailing
  * `x PRECEDING .. CURRENT ROW`, centered, lookahead, detached), with NO
  * PARTITION BY and NO single-partition stage: the value-distance member
  * of the two-pass family (GlobalFrame is its row-distance sibling).
  *
  * A RANGE frame's row membership is decided by KEY ARITHMETIC, not row
  * position: row t's frame is every row whose key lies in
  * [t + lo, t + hi] — including FOLLOWING peers when hi >= 0 (the SQL
  * `CURRENT ROW` upper bound in range mode means "last peer"). After
  * range partitioning, that neighborhood is either local or lies within
  * value distance max(|lo|, |hi|) of a partition's edge KEY:
  *
  *   1. the input is total-ordered by range partitioning (planned sort);
  *   2. pass 1 captures, per partition, the HEAD rows with
  *      key <= firstKey + max(hi) and the TAIL rows with
  *      key >= lastKey + min(lo) — the only rows any other partition
  *      can need. Both captures ship to the driver and are capped at
  *      [[GlobalRange.MaxBoundary]] narrow rows (a neighborhood wider
  *      than that means the range spans a plateau the size of a
  *      partition — the operator throws loudly rather than shipping it);
  *   3. the driver splices, per partition, the exact preceding rows with
  *      key >= firstKey(p) + min(lo) and following rows with
  *      key <= lastKey(p) + max(hi), walking across partitions that
  *      qualify WHOLE (a capture covering its entire partition whose
  *      rows all qualify passes the walk through — the same mechanism as
  *      GlobalFrame's row splice, re-keyed by value), and broadcasts
  *      them;
  *   4. pass 2 streams each partition once: preceding ++ local ++
  *      following push through a growable buffer of narrow (key, value)
  *      rows; a local row is emitted once a pushed key exceeds
  *      t + max(hi) (sorted input: its widest frame is then complete).
  *      Per spec, frame endpoints advance monotonically (enter/exit
  *      pointers — each stream index enters and leaves each spec's
  *      frame exactly once).
  *
  * Per-row cost per aggregate: count / count(*) / legacy sum are O(1)
  * amortized (enter/exit deltas; wrapping subtraction is exact on the
  * ring of Long); min/max amortized O(1) via monotonic deques; ANSI sum
  * and avg re-fold the frame in order — ANSI sum must raise exactly when
  * the native frame's in-order partial overflows, and avg must reproduce
  * native Average's in-frame-order Double accumulation bit-for-bit
  * (Spark's sliding frame recomputes its buffer per slide the same way).
  * Task memory is the frame's own working set (the rows within [lo, hi]
  * of the current key) — the buffering WindowExec does per frame, but
  * over a partition's slice instead of one task holding the whole
  * corpus.
  *
  * Scope (the rule keeps WindowExec otherwise): single ASCENDING
  * integral OR timestamp ORDER key; integral literal bounds for the
  * former, day-time/calendar interval bounds (normalized to micros; no
  * month components — a month is not a fixed number of micros) for the
  * latter. NULL keys follow the SQL
  * range semantics the native window implements: null-key rows are peers
  * of each other and their frame is exactly their peer group (offset
  * arithmetic over null is null, which bounds the frame to the group),
  * while non-null frames never contain null-key rows. Nulls sort FIRST
  * under the ascending order, so the null group is a stream prefix; it
  * splices across partitions like any other plateau (and like any
  * plateau, one wider than [[GlobalRange.MaxBoundary]] throws loudly).
  * Descending orders invert the offset arithmetic; flip the sign in the
  * query instead.
  *
  * Reference analogue: none (the reference has no windows); engine
  * extension completing the GlobalScan/Frame family for value frames.
  */
case class RangeSpec(kind: ScanKind, lo: Long, hi: Long, ansi: Boolean)
  extends Serializable {
  require(lo <= hi, s"range bounds out of order: [$lo, $hi]")
  /** The frame always contains the current row itself. */
  def coversCurrent: Boolean = lo <= 0L && 0L <= hi
}

// Output typing mirrors GlobalFramePlan: counts are non-null longs;
// sum/min/max/avg are nullable when the value is, or when the frame can
// be empty (a frame not covering the current row truncates to empty at
// the corpus edges / sparse key regions).
object GlobalRangePlan {
  def apply(order: Seq[SortOrder], key: Attribute, specs: Seq[RangeSpec],
            values: Seq[Attribute], child: LogicalPlan): GlobalRangePlan = {
    require(specs.nonEmpty, "GlobalRangePlan needs at least one spec")
    require(specs.length == values.length,
      "one value column per spec (a placeholder for count(*))")
    val attrs = specs.zip(values).map { case (sp, value) =>
      if (sp.kind == ScanKind.Sum || sp.kind == ScanKind.Avg)
        require(value.dataType == LongType,
          s"${sp.kind.sql} needs a LongType value column, got " +
            s"${value.dataType} (the rule widens integral inputs)")
      val maybeEmpty = !sp.coversCurrent
      val (dt, nullable) = sp.kind match {
        case ScanKind.Count | ScanKind.Rows =>
          (LongType: org.apache.spark.sql.types.DataType, false)
        case ScanKind.Avg =>
          (org.apache.spark.sql.types.DoubleType,
            value.nullable || maybeEmpty)
        case ScanKind.Min | ScanKind.Max =>
          (value.dataType, value.nullable || maybeEmpty)
        case _ => (LongType, value.nullable || maybeEmpty)
      }
      AttributeReference("range", dt, nullable)()
    }
    GlobalRangePlan(order, key, specs, values, child, attrs)
  }
}

case class GlobalRangePlan(order: Seq[SortOrder], key: Attribute,
    specs: Seq[RangeSpec], values: Seq[Attribute], child: LogicalPlan,
    rangeAttrs: Seq[AttributeReference])
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rangeAttrs
  override def producedAttributes
  : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rangeAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
  : GlobalRangePlan = copy(child = newChild)
}

case class GlobalRangeExec(order: Seq[SortOrder], key: Attribute,
    specs: Seq[RangeSpec], values: Seq[Attribute],
    rangeAttrs: Seq[Attribute], child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output ++ rangeAttrs

  override def requiredChildDistribution
  : Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  // per-partition 1:1 operator: rows never move, so the child's (range)
  // partitioning survives for consumers wanting the same distribution
  override def outputPartitioning
  : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  import GlobalRangeExec.{Partial, satAdd}

  override protected def doExecute(): RDD[InternalRow] = {
    val nSpecs = specs.length
    val keyOrd = child.output.indexWhere(_.exprId == key.exprId)
    require(keyOrd >= 0, s"order key $key not in child output")
    val ords = values.map(v =>
      child.output.indexWhere(_.exprId == v.exprId)).toArray
    values.zip(ords).foreach { case (v, o) =>
      require(o >= 0, s"value column $v not in child output") }
    val dts = values.map(_.dataType).toArray
    // narrow row layout: field 0 = key upcast to Long, field i+1 =
    // spec i's value (count(*)'s placeholder included — never read, but
    // a uniform layout keeps field index == spec index + 1 everywhere)
    // Timestamps are ALREADY physical long micros — keep them un-cast
    // (Cast(ts, long) evaluates to SECONDS, which would silently scale
    // the frame bounds 10^6 wide); narrower integrals upcast to Long.
    val keyRef = BoundReference(keyOrd, key.dataType,
      nullable = key.nullable)
    val keyExpr: org.apache.spark.sql.catalyst.expressions.Expression =
      key.dataType match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => keyRef
        case LongType => keyRef
        case _ => Cast(keyRef, LongType)
      }
    val bounds = keyExpr +: ords.indices.map(i =>
      BoundReference(ords(i), dts(i), nullable = values(i).nullable))
    val kinds = specs.map(_.kind).toArray
    val los = specs.map(_.lo).toArray
    val his = specs.map(_.hi).toArray
    val ansis = specs.map(_.ansi).toArray
    val minLo = los.min
    val maxHi = his.max
    val cap = GlobalRange.MaxBoundary

    // same persist rationale as the siblings: the sorted child feeds two
    // passes that must see identical row order (rows copied — operators
    // reuse mutable UnsafeRow buffers)
    val input = child.execute()
      .mapPartitions(it => it.map(_.copy()), preservesPartitioning = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // pass 1: per partition, its row count, edge keys, and the head/tail
    // rows within the frame reach of its edges — narrow rows only.
    // Null keys sort FIRST: a partition's null rows are a leading run;
    // a partition whose LAST key is null is entirely null.
    val numParts = input.getNumPartitions
    val partials: Array[Partial] = input.mapPartitionsWithIndex({
      (pid, it) =>
      val proj = UnsafeProjection.create(bounds)
      // boundary captures only exist to serve OTHER partitions: the
      // first partition has nobody before it (no head), the last nobody
      // after (no tail) — skipping them avoids both the work and any
      // spurious cap throw on a plateau at the corpus edge
      val wantHead = pid > 0
      val wantTail = pid < numParts - 1
      var count = 0L
      var firstKey = 0L; var lastKey = 0L
      var firstNull = false; var lastNull = false
      val head = new scala.collection.mutable.ArrayBuffer[UnsafeRow]()
      var headOpen = true
      val tail = new scala.collection.mutable.ArrayDeque[UnsafeRow]()
      var inNullPrefix = true
      def blowUp(side: String): Nothing =
        throw new IllegalStateException(
          s"GlobalRange boundary blow-up: more than $cap rows lie " +
            s"within frame reach of a partition's $side edge — the " +
            "range spans a partition-sized plateau; use a partitioned " +
            "window or a narrower range")
      it.foreach { row =>
        val r = proj(row).copy()
        val kNull = r.isNullAt(0)
        val k = if (kNull) 0L else r.getLong(0)
        if (count == 0L) { firstKey = k; firstNull = kNull }
        lastKey = k; lastNull = kNull
        count += 1L
        // head: rows any EARLIER partition could need. If this partition
        // starts with nulls, earlier partitions are entirely null and
        // need the leading null run (their peers); otherwise the usual
        // rows within maxHi of our first key. The head is a prefix
        // capture (no eviction), so its inline cap check is final.
        if (wantHead && headOpen) {
          val qualifies =
            if (firstNull) kNull
            else !kNull && maxHi >= 0L && k <= satAdd(firstKey, maxHi)
          if (qualifies) {
            head += r
            if (head.length > cap) blowUp("first")
          } else headOpen = false
        }
        // tail: rows any LATER partition could need. Null rows are
        // buffered while the global null prefix may continue past us
        // (needed as peers by later all-null partitions); the buffer is
        // discarded wholesale at the first non-null key — from there no
        // later partition can hold nulls, and the usual within-|minLo|
        // eviction applies. The cap is checked on the FINAL tail below,
        // not inline: only the final tail ships to the driver, and a
        // mid-partition plateau that later evicts is pass-2-sized
        // transient working memory, not a boundary.
        if (wantTail) {
          if (kNull) tail.append(r)
          else {
            if (inNullPrefix) { tail.clear(); inNullPrefix = false }
            if (minLo <= 0L) {
              while (tail.nonEmpty &&
                tail.head.getLong(0) < satAdd(k, minLo)) tail.removeHead()
              tail.append(r)
            }
          }
        }
      }
      if (tail.length > cap) blowUp("last")
      Iterator.single(Partial(count, firstKey, lastKey, firstNull,
        lastNull, head.toArray, tail.toArray))
    }, preservesPartitioning = true).collect()

    // driver: per partition p, the exact preceding rows with
    // key >= firstKey(p) + minLo and following rows with
    // key <= lastKey(p) + maxHi, walked across whole-qualifying
    // partitions (empty partitions are transparent). A partition
    // touching the global null prefix additionally splices the null
    // PEER GROUP across partitions (cap-checked like any plateau).
    val parts = partials.length
    val preceding = new Array[Array[UnsafeRow]](parts)
    val following = new Array[Array[UnsafeRow]](parts)
    def spliceBlowUp(): Nothing =
      throw new IllegalStateException(
        s"GlobalRange boundary blow-up: a spliced boundary exceeds " +
          s"$cap rows — the range (or the null peer group) spans a " +
          "partition-sized plateau; use a partitioned window or a " +
          "narrower range")
    var p = 0
    while (p < parts) {
      val me = partials(p)
      if (me.count == 0L) {
        preceding(p) = Array.empty; following(p) = Array.empty
      } else {
        val acc = new scala.collection.mutable.ArrayDeque[UnsafeRow]()
        if (me.firstNull) {
          // this partition starts inside the global null prefix: every
          // earlier non-empty partition is entirely null, and its rows
          // are this partition's null rows' PEERS — splice them all
          var q = p - 1
          while (q >= 0) {
            val pq = partials(q)
            if (pq.count > 0L) {
              var j = pq.tail.length - 1
              while (j >= 0) { acc.prepend(pq.tail(j)); j -= 1 }
              if (acc.length > cap) spliceBlowUp()
            }
            q -= 1
          }
          // (no non-null preceding need: this partition's non-null rows,
          // if any, have every preceding non-null row locally)
        } else {
          val needLo = satAdd(me.firstKey, minLo)
          var q = p - 1
          var walk = minLo <= 0L
          while (walk && q >= 0) {
            val pq = partials(q)
            if (pq.count == 0L) q -= 1 // transparent
            else {
              // qualifying suffix of q's (sorted) tail capture — null
              // tail rows (all-null partitions) never qualify for a
              // non-null need, which also stops the walk below them
              val t = pq.tail
              var i = t.length - 1
              while (i >= 0 && !t(i).isNullAt(0) &&
                t(i).getLong(0) >= needLo) i -= 1
              var j = t.length - 1
              while (j > i) { acc.prepend(t(j)); j -= 1 }
              // walk on only if q qualified WHOLE (capture covers the
              // partition and every captured row was in range)
              walk = (t.length - 1 - i).toLong == pq.count
              q -= 1
            }
          }
        }
        preceding(p) = acc.toArray
        val fcc = new scala.collection.mutable.ArrayBuffer[UnsafeRow]()
        if (me.lastNull) {
          // entirely-null partition: later partitions' leading null
          // runs are this partition's rows' peers
          var q = p + 1
          var walk = true
          while (walk && q < parts) {
            val pq = partials(q)
            if (pq.count == 0L) q += 1
            else {
              val h = pq.head
              var i = 0
              while (i < h.length && h(i).isNullAt(0)) {
                fcc += h(i); i += 1
              }
              if (fcc.length > cap) spliceBlowUp()
              // continue only while the next partition is null WHOLE
              walk = pq.lastNull && i.toLong == pq.count
              q += 1
            }
          }
        } else {
          val needHi = satAdd(me.lastKey, maxHi)
          var q = p + 1
          var walk = maxHi >= 0L
          while (walk && q < parts) {
            val pq = partials(q)
            if (pq.count == 0L) q += 1
            else {
              val h = pq.head
              var i = 0
              while (i < h.length && !h(i).isNullAt(0) &&
                h(i).getLong(0) <= needHi) {
                fcc += h(i); i += 1
              }
              walk = i.toLong == pq.count
              q += 1
            }
          }
        }
        following(p) = fcc.toArray
      }
      p += 1
    }
    val bcPre = input.sparkContext.broadcast(preceding)
    val bcPost = input.sparkContext.broadcast(following)

    // pass 2: one streaming pass per partition
    val types = output.map(_.dataType).toArray
    input.mapPartitionsWithIndex({ (pid, it) =>
      val pre = bcPre.value(pid)
      val post = bcPost.value(pid)
      val nCols = types.length
      val base = nCols - nSpecs
      val outProj = UnsafeProjection.create(types)
      val valueProj = UnsafeProjection.create(bounds)
      val out = new GenericInternalRow(nCols)

      // stream buffer of narrow rows, addressable by global stream index
      val buf = new scala.collection.mutable.ArrayDeque[UnsafeRow]()
      var bufBase = 0L // global index of buf.head
      var pushed = 0L  // global index one past the newest push
      def bufGet(gi: Long): UnsafeRow = buf((gi - bufBase).toInt)
      def push(vrow: UnsafeRow): Unit = { buf.append(vrow); pushed += 1L }

      // per-spec monotone frame pointers + incremental state
      val start = new Array[Long](nSpecs) // first index with key >= t+lo
      val end = new Array[Long](nSpecs)   // one past last with key <= t+hi
      val cnt = new Array[Long](nSpecs)   // non-null values in frame
      val wsum = new Array[Long](nSpecs)  // wrapping frame sum (legacy)
      val isExt = kinds.map(kd => kd == ScanKind.Min || kd == ScanKind.Max)
      val isMin = kinds.map(_ == ScanKind.Min)
      val incremental = Array.tabulate(nSpecs)(i =>
        kinds(i) == ScanKind.Count ||
          (kinds(i) == ScanKind.Sum && !ansis(i)))
      val gord = Array.tabulate(nSpecs)(i =>
        if (isExt(i))
          org.apache.spark.sql.catalyst.util.TypeUtils
            .getInterpretedOrdering(dts(i))
        else null)
      // monotonic deques: (stream index, boxed value); values extracted
      // at entry from that push's own row copy
      val deques = Array.fill(nSpecs)(
        new scala.collection.mutable.ArrayDeque[(Long, Any)]())

      def emit(full: InternalRow, t: Long, tNull: Boolean): UnsafeRow = {
        var j = 0
        while (j < base) { out.update(j, full.get(j, types(j))); j += 1 }
        var i = 0
        while (i < nSpecs) {
          val loK = satAdd(t, los(i))
          val hiK = satAdd(t, his(i))
          // ENTER: every pushed index whose key is within the frame's
          // upper bound, ascending. A NULL current key frames exactly
          // its peer group — the stream's null prefix (SQL range
          // semantics: null +- offset is null). For a non-null key,
          // null stream rows (ordered first) satisfy the <= bound and
          // enter here, but always LEAVE again below before results are
          // read (null < any loK), so they never contribute.
          while (end(i) < pushed && {
            val e = bufGet(end(i))
            if (tNull) e.isNullAt(0)
            else e.isNullAt(0) || e.getLong(0) <= hiK
          }) {
            val vrow = bufGet(end(i))
            if (!vrow.isNullAt(i + 1)) {
              if (incremental(i)) {
                cnt(i) += 1L
                if (kinds(i) == ScanKind.Sum) wsum(i) += vrow.getLong(i + 1)
              }
              if (isExt(i)) {
                val v = vrow.get(i + 1, dts(i))
                val dq = deques(i)
                val ord = gord(i)
                while (dq.nonEmpty && {
                  val c = ord.compare(dq.last._2, v)
                  if (isMin(i)) c >= 0 else c <= 0
                }) dq.removeLast()
                dq.append((end(i), v))
              }
            }
            end(i) += 1L
          }
          // LEAVE: every index whose key fell below loK (null keys
          // count as below every non-null bound; a null current key
          // leaves nothing — its peer-group frame only grows)
          while (!tNull && start(i) < end(i) && {
            val d = bufGet(start(i))
            d.isNullAt(0) || d.getLong(0) < loK
          }) {
            val drow = bufGet(start(i))
            if (incremental(i) && !drow.isNullAt(i + 1)) {
              cnt(i) -= 1L
              if (kinds(i) == ScanKind.Sum) wsum(i) -= drow.getLong(i + 1)
            }
            start(i) += 1L
          }
          val col = base + i
          kinds(i) match {
            case ScanKind.Rows =>
              out.update(col, end(i) - start(i))
            case ScanKind.Count =>
              out.update(col, cnt(i))
            case ScanKind.Sum if !ansis(i) =>
              if (cnt(i) == 0L) out.setNullAt(col)
              else out.update(col, wsum(i))
            case ScanKind.Sum => // ANSI: exact in-order re-fold — raises
              // exactly when the native frame's in-order partial would
              var s = 0L; var any = false
              var gi = start(i)
              while (gi < end(i)) {
                val r = bufGet(gi)
                if (!r.isNullAt(i + 1)) {
                  s = Math.addExact(s, r.getLong(i + 1)); any = true
                }
                gi += 1L
              }
              if (any) out.update(col, s) else out.setNullAt(col)
            case ScanKind.Avg =>
              // native parity: in-frame-order Double accumulation
              var d = 0.0; var c = 0L
              var gi = start(i)
              while (gi < end(i)) {
                val r = bufGet(gi)
                if (!r.isNullAt(i + 1)) { d += r.getLong(i + 1); c += 1L }
                gi += 1L
              }
              if (c > 0L) out.update(col, d / c) else out.setNullAt(col)
            case _ => // Min | Max: expire, then read the front
              val dq = deques(i)
              while (dq.nonEmpty && dq.head._1 < start(i)) dq.removeHead()
              if (dq.isEmpty || dq.head._1 >= end(i)) out.setNullAt(col)
              else out.update(col, dq.head._2)
          }
          i += 1
        }
        // evict buffer rows below every spec's frame start
        var minStart = Long.MaxValue
        i = 0
        while (i < nSpecs) {
          if (start(i) < minStart) minStart = start(i); i += 1
        }
        while (bufBase < minStart) { buf.removeHead(); bufBase += 1L }
        outProj(out)
      }

      pre.foreach(push)
      // local rows pending emission until their widest frame is
      // complete: a non-null key waits for a pushed key past t + maxHi;
      // a null key waits for the first NON-null push (the null peer
      // group is then complete). The persisted iterator yields distinct
      // row objects, so holding them is safe.
      val pending = new scala.collection.mutable
        .ArrayDeque[(InternalRow, Long, Boolean)]()
      def drainReady(k: Long, kNull: Boolean): Iterator[UnsafeRow] = {
        var outRows = List.empty[UnsafeRow]
        var go = true
        while (go && pending.nonEmpty) {
          val (row, t, tNull) = pending.head
          val ready =
            if (tNull) !kNull
            else !kNull && satAdd(t, maxHi) < k
          if (ready) {
            pending.removeHead()
            // this drain is EAGER (a whole tie group can release at
            // once) and the projection reuses its output buffer — copy,
            // or every row of the batch aliases the last emission
            outRows ::= emit(row, t, tNull).copy()
          }
          else go = false
        }
        outRows.reverseIterator
      }
      val main = it.flatMap { row =>
        val vrow = valueProj(row).copy()
        val tNull = vrow.isNullAt(0)
        val t = if (tNull) 0L else vrow.getLong(0)
        val ready = drainReady(t, tNull)
        push(vrow)
        pending.append((row, t, tNull))
        ready
      }
      // Iterator.++'s operand is by-name: the tail below only runs after
      // `main` is exhausted.
      main ++ {
        val drained = post.iterator.flatMap { vrow =>
          val kNull = vrow.isNullAt(0)
          val ready = drainReady(if (kNull) 0L else vrow.getLong(0), kNull)
          push(vrow)
          ready
        }
        drained ++ pending.iterator.map { case (row, t, tNull) =>
          emit(row, t, tNull) }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
  : GlobalRangeExec = copy(child = newChild)
}

object GlobalRangeExec {
  /** Per-partition pass-1 summary: row count, edge keys (meaningless
    * when count == 0), and the head/tail narrow-row captures. Top-level
    * so task closures don't drag the SparkPlan in. */
  private[plans] case class Partial(count: Long, firstKey: Long,
      lastKey: Long, firstNull: Boolean, lastNull: Boolean,
      head: Array[UnsafeRow], tail: Array[UnsafeRow])

  /** Saturating add: frame-bound arithmetic must not wrap at the Long
    * edges (the bounds only feed comparisons). */
  private[plans] def satAdd(a: Long, b: Long): Long = {
    val r = a + b
    if (b > 0 && r < a) Long.MaxValue
    else if (b < 0 && r > a) Long.MinValue
    else r
  }
}

object GlobalRangeStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalRangePlan =>
      GlobalRangeExec(g.order, g.key, g.specs, g.values, g.rangeAttrs,
        org.apache.spark.sql.execution.PlanLater(g.child)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: rewrite an un-partitioned Window whose expressions
  * are ALL bounded value-RANGE aggregates over one ascending
  * non-nullable integral ORDER key into one fused [[GlobalRangePlan]].
  * All-or-nothing, same rationale as the siblings; LIMIT-bounded inputs
  * keep WindowExec. */
object GlobalRangeRule
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending,
    Attribute => CAttr, CurrentRow, Expression, Literal, NamedExpression,
    RangeFrame, SpecifiedWindowFrame, UnaryMinus, WindowExpression,
    WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
  import org.apache.spark.sql.catalyst.plans.logical.{Project, Window}
  import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}

  /** A bounded RANGE offset normalized to the key's LONG domain:
    * CurrentRow (0), an integral literal, a day-time interval literal
    * (physical micros — the boundary type Spark resolves for a
    * timestamp ORDER BY), or a calendar interval with no month
    * component (months are not a fixed number of micros) — possibly
    * under the parser's unfolded UnaryMinus. */
  private object RangeOffset {
    def unapply(e: Expression): Option[Long] = e match {
      case CurrentRow => Some(0L)
      case Literal(v: Long, LongType) if v != Long.MinValue => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Short, ShortType) => Some(v.toLong)
      case Literal(v: Byte, ByteType) => Some(v.toLong)
      case Literal(v: Long, _: org.apache.spark.sql.types
          .DayTimeIntervalType) if v != Long.MinValue => Some(v)
      case Literal(iv: org.apache.spark.unsafe.types.CalendarInterval, _)
          if iv.months == 0 =>
        Some(iv.days * 86400000000L + iv.microseconds)
      case UnaryMinus(RangeOffset(n), _) if n != Long.MinValue => Some(-n)
      case _ => None
    }
  }

  /** Keys whose physical representation is a long the frame arithmetic
    * can run on directly: integrals (upcast below the plan) and
    * timestamps (micros — interval offsets are micros too). */
  private def supportedKey(a: CAttr): Boolean =
    a.dataType == LongType || a.dataType == IntegerType ||
      a.dataType == ShortType || a.dataType == ByteType ||
      a.dataType == org.apache.spark.sql.types.TimestampType ||
      a.dataType == org.apache.spark.sql.types.TimestampNTZType

  // private[plans]: [[GlobalWindowRule]] reuses the value-range parser
  // to compose mixed-family global windows onto one shared sort
  private[plans] case class RParsed(alias: Alias, order: Seq[SortOrder],
      key: CAttr, lo: Long, hi: Long, kind: ScanKind, value: CAttr,
      ansi: Boolean, widen: Boolean)

  private[plans] def parseRange(e: NamedExpression,
                         child: LogicalPlan): Option[RParsed] = e match {
    case a @ Alias(WindowExpression(agg: AggregateExpression,
          WindowSpecDefinition(Seq(), Seq(so),
            SpecifiedWindowFrame(RangeFrame, RangeOffset(lo),
              RangeOffset(hi)))),
        _) if so.direction == Ascending && !agg.isDistinct &&
          agg.filter.isEmpty && lo <= hi &&
          // unbounded sides never parse (RangeOffset rejects them);
          // nullable keys are fine: the exec implements the SQL null
          // peer-group semantics
          so.child.isInstanceOf[CAttr] &&
          supportedKey(so.child.asInstanceOf[CAttr]) =>
      GlobalScanRule.scannable(agg, child).map { case (kind, v, ansi,
          widen) =>
        RParsed(a, Seq(so), so.child.asInstanceOf[CAttr], lo, hi, kind, v,
          ansi, widen)
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case w @ Window(exprs, Seq(), _, child, _) if exprs.nonEmpty =>
      val parsed = exprs.map(parseRange(_, child))
      val orders = parsed.flatten.map(_.order).distinct
      if (parsed.exists(_.isEmpty) || orders.size != 1 ||
          GlobalRankRule.isLimitBounded(child)) w
      else {
        val ps = parsed.flatten
        val key = ps.head.key
        // integral inputs of widen-marked specs upcast to Long in ONE
        // Project below the plan (deduped by exprId), same as siblings
        val widenPairs = ps.filter(_.widen).map(_.value)
          .filter(_.dataType != LongType)
          .groupBy(_.exprId).map(_._2.head)
          .map(v => v.exprId ->
            Alias(org.apache.spark.sql.catalyst.expressions
              .Cast(v, LongType), v.name + "_rngl")())
          .toMap
        val inner: LogicalPlan =
          if (widenPairs.isEmpty) child
          else Project(child.output ++ widenPairs.values, child)
        val values = ps.map(p =>
          if (p.widen) widenPairs.get(p.value.exprId)
            .map(_.toAttribute: CAttr).getOrElse(p.value)
          else p.value)
        val g = GlobalRangePlan(orders.head, key,
          ps.map(p => RangeSpec(p.kind, p.lo, p.hi, p.ansi)), values,
          inner)
        var i = -1
        val results = ps.map { p =>
          i += 1
          val attr = g.rangeAttrs(i)
          val result: Expression =
            if (attr.dataType == p.alias.dataType) attr
            else org.apache.spark.sql.catalyst.expressions
              .Cast(attr, p.alias.dataType)
          Alias(result, p.alias.name)(exprId = p.alias.exprId,
            qualifier = p.alias.qualifier,
            explicitMetadata = p.alias.explicitMetadata)
        }
        Project(child.output ++ results, g): LogicalPlan
      }
  }
}

object GlobalRange {
  /** Per-partition, per-side cap on the boundary rows shipped to the
    * driver. A neighborhood wider than this means the range covers a
    * partition-sized key plateau — no longer "a bounded neighborhood of
    * the partition edge"; the operator throws loudly instead of
    * shipping the partition. */
  val MaxBoundary = 4096

  def ensureStrategy(spark: SparkSession): Unit =
    SessionHooks.ensureStrategy(spark, GlobalRangeStrategy)

  /** Register [[GlobalRangeRule]] (+ its strategy) on a session,
    * idempotently. */
  def ensureRule(spark: SparkSession): Unit =
    SessionHooks.ensureRule(spark, GlobalRangeRule, GlobalRangeStrategy)

  /** Undo [[ensureRule]] (tests; a production session keeps it). */
  def removeRule(spark: SparkSession): Unit =
    SessionHooks.removeRule(spark, GlobalRangeRule)
}
