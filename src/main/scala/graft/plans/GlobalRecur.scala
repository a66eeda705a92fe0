package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** GLOBAL FIRST-ORDER LINEAR RECURRENCE — `y_i = m_i * y_{i-1} + c_i`
  * over a total order, with NO single-partition stage: the scan algebra
  * no built-in window function can express (each output depends on ALL
  * previous rows through a non-commutative fold), distributed through
  * the same two-pass discipline as the Global* window family.
  *
  * The per-row transform `f_i(y) = m_i*y + c_i` is an affine map, and
  * affine maps COMPOSE associatively: `(f2 ∘ f1)(y) = (m2*m1)*y +
  * (m2*b1 + c2)`. So:
  *
  *   1. the input is total-ordered by range partitioning (planned sort);
  *   2. pass 1 folds each partition's rows into ONE composed transform
  *      (M_p, B_p) — two scalars per partition to the driver;
  *   3. the driver prefix-composes the P transforms to the exact state
  *      entering each partition — O(partitions) scalar work;
  *   4. pass 2 streams each partition once, threading the recurrence
  *      from its spliced start state.
  *
  * Two element algebras, chosen by the m/c column type:
  *
  *   - LONG, wrapping mod 2^64 — EXACT. This is polynomial/rolling-hash
  *     algebra (`h_i = base*h_{i-1} + token_i`): chained corpus
  *     fingerprints, LCG state advance, checksum chains. Associativity
  *     is exact, so the distributed fold is bit-identical to the
  *     sequential recurrence.
  *   - DOUBLE — EWMA and friends (`y = a*y + (1-a)*x`). Floating-point
  *     affine composition is associative only up to rounding: crossing a
  *     partition boundary applies the composed (M_p, B_p) in one fused
  *     step where the sequential recurrence threads y through every row,
  *     so results agree to ~ulp/(1-a) but are NOT bit-identical to a
  *     single-threaded fold. Callers hash-comparing against a sequential
  *     reference must compare with tolerance (RecurrenceSpec pins the
  *     bound); exact-output pipelines should use the Long algebra.
  *
  * Rows whose m or c is NULL are identity rows: the state passes through
  * unchanged and is emitted as that row's y (shape null semantics in the
  * m/c expressions — e.g. an EWMA that skips nulls maps them to
  * (m=1, c=0)).
  *
  * No optimizer rule: Spark has no SQL surface for recurrences, so there
  * is no Window shape to intercept — [[Recurrence]] builds this plan
  * directly (like `GlobalRank.ranked`), and [[GlobalRecurStrategy]]
  * plans it. */
case class GlobalRecurPlan(order: Seq[SortOrder], m: Attribute,
    c: Attribute, seed: Any, child: LogicalPlan,
    // constructor field so copy()/transform preserve the exprId
    yAttr: AttributeReference)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ yAttr
  override def producedAttributes
  : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(yAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
  : GlobalRecurPlan = copy(child = newChild)
}

object GlobalRecurPlan {
  def apply(order: Seq[SortOrder], m: Attribute, c: Attribute, seed: Any,
            child: LogicalPlan): GlobalRecurPlan = {
    require(m.dataType == c.dataType &&
      (m.dataType == LongType || m.dataType == DoubleType),
      s"recurrence columns must both be LONG or both DOUBLE, " +
        s"got ${m.dataType}/${c.dataType}")
    GlobalRecurPlan(order, m, c, seed, child,
      AttributeReference("y", m.dataType, nullable = false)())
  }
}

case class GlobalRecurExec(order: Seq[SortOrder], m: Attribute,
    c: Attribute, seed: Any, yAttr: Attribute, child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ yAttr

  override def requiredChildDistribution
  : Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  // 1:1 per-partition operator: rows never move (see GlobalShiftExec)
  override def outputPartitioning
  : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val isLong = m.dataType == LongType
    val mOrd = child.output.indexWhere(_.exprId == m.exprId)
    val cOrd = child.output.indexWhere(_.exprId == c.exprId)
    require(mOrd >= 0 && cOrd >= 0,
      s"recurrence columns $m/$c not in child output")
    // same persist rationale as the siblings: sorted child feeds two
    // passes; rows copied (operators reuse UnsafeRow buffers)
    val inputRdd = child.execute()
      .mapPartitions(it => it.map(_.copy()), preservesPartitioning = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: fold each partition into its composed affine transform —
    // TWO scalars per partition, regardless of partition size
    val partials: Array[(Any, Any)] =
      inputRdd.mapPartitions({ it =>
        if (isLong) {
          var cm = 1L; var cb = 0L // identity transform
          it.foreach { row =>
            if (!row.isNullAt(mOrd) && !row.isNullAt(cOrd)) {
              val mi = row.getLong(mOrd); val ci = row.getLong(cOrd)
              cm = mi * cm // wrapping mod 2^64 — exact algebra
              cb = mi * cb + ci
            }
          }
          Iterator.single((cm: Any, cb: Any))
        } else {
          var cm = 1.0; var cb = 0.0
          it.foreach { row =>
            if (!row.isNullAt(mOrd) && !row.isNullAt(cOrd)) {
              val mi = row.getDouble(mOrd); val ci = row.getDouble(cOrd)
              cm = mi * cm
              cb = mi * cb + ci
            }
          }
          Iterator.single((cm: Any, cb: Any))
        }
      }, preservesPartitioning = true).collect()
    // driver: prefix-compose to the exact state ENTERING each partition
    val parts = partials.length
    val starts = new Array[Any](parts)
    if (isLong) {
      var y = seed.asInstanceOf[Long]
      var p = 0
      while (p < parts) {
        starts(p) = y
        val (cm, cb) = (partials(p)._1.asInstanceOf[Long],
          partials(p)._2.asInstanceOf[Long])
        y = cm * y + cb
        p += 1
      }
    } else {
      var y = seed.asInstanceOf[Double]
      var p = 0
      while (p < parts) {
        starts(p) = y
        val (cm, cb) = (partials(p)._1.asInstanceOf[Double],
          partials(p)._2.asInstanceOf[Double])
        y = cm * y + cb
        p += 1
      }
    }
    val bc = inputRdd.sparkContext.broadcast(starts)
    // pass 2: thread the recurrence from the spliced start state
    val types = output.map(_.dataType).toArray
    inputRdd.mapPartitionsWithIndex({ (pid, it) =>
      val nCols = types.length
      val proj = UnsafeProjection.create(types)
      val out = new GenericInternalRow(nCols)
      if (isLong) {
        var y = bc.value(pid).asInstanceOf[Long]
        it.map { row =>
          if (!row.isNullAt(mOrd) && !row.isNullAt(cOrd))
            y = row.getLong(mOrd) * y + row.getLong(cOrd)
          var j = 0
          while (j < nCols - 1) { out.update(j, row.get(j, types(j))); j += 1 }
          out.update(nCols - 1, y)
          proj(out)
        }
      } else {
        var y = bc.value(pid).asInstanceOf[Double]
        it.map { row =>
          if (!row.isNullAt(mOrd) && !row.isNullAt(cOrd))
            y = row.getDouble(mOrd) * y + row.getDouble(cOrd)
          var j = 0
          while (j < nCols - 1) { out.update(j, row.get(j, types(j))); j += 1 }
          out.update(nCols - 1, y)
          proj(out)
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
  : GlobalRecurExec = copy(child = newChild)
}

object GlobalRecurStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalRecurPlan =>
      GlobalRecurExec(g.order, g.m, g.c, g.seed, g.yAttr,
        org.apache.spark.sql.execution.PlanLater(g.child)) :: Nil
    case _ => Nil
  }
}

/** Library surface for the recurrence operator (no SQL shape exists to
  * rewrite, so these build the plan node directly). */
object Recurrence {

  def ensureStrategy(spark: SparkSession): Unit =
    SessionHooks.ensureStrategy(spark, GlobalRecurStrategy)

  /** df + `y` column: `y_i = m_i * y_{i-1} + c_i` threaded over the
    * total order given by `keys` ((name, descending) pairs). `mCol` and
    * `cCol` must both be LONG (exact wrapping algebra) or both DOUBLE.
    * NULL m/c rows pass the state through unchanged. */
  def scan(df: DataFrame, mCol: String, cCol: String, seed: Any,
           keys: (String, Boolean)*): DataFrame = {
    ensureStrategy(df.sparkSession)
    val analyzed = SessionHooks.analyzed(df)
    SessionHooks.ofRows(df,
      GlobalRecurPlan(SessionHooks.resolveOrder(analyzed, keys),
        SessionHooks.attr(analyzed, mCol), SessionHooks.attr(analyzed, cCol),
        seed, analyzed))
  }
}
