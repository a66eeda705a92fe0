package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GlobalHalfRangeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private type WS = org.apache.spark.sql.expressions.WindowSpec
  private val w = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
  private val wN = org.apache.spark.sql.expressions.Window
    .partitionBy(pmod(col("t"), lit(1))).orderBy(col("t"))

  /** Key plateaus, value nulls, negatives; several partitions. */
  private def df(n: Int) = spark.range(n).select(
    (col("id") / 7).cast("long").as("t"),
    when(col("id") % 5 =!= 0, (col("id") * 13 % 401) - 100).as("v"))
    .repartition(9)
    .withColumn("rid", monotonically_increasing_id())

  private def parity(build: WS => org.apache.spark.sql.DataFrame,
      label: String): String = {
    val nq = build(wN)
    assert(nq.queryExecution.executedPlan.toString.contains("Window"),
      s"$label: twin lost WindowExec")
    val native = nq.orderBy(col("t"), col("rid")).collect().toSeq
    val q = build(w)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"$label: half-bounded member kept WindowExec:\n$plan")
    assert(q.orderBy(col("t"), col("rid")).collect().toSeq == native, label)
    plan
  }

  test("lagged totals (y PRECEDING) match the native window: sum, " +
    "count, count(*), incl. empty and all-null-prefix frames") {
    for (y <- Seq(1L, 3L, 40L)) {
      val plan = parity(b => df(2000).select(col("t"), col("rid"),
        sum(col("v")).over(b.rangeBetween(Long.MinValue, -y)).as("s"),
        count(col("v")).over(b.rangeBetween(Long.MinValue, -y)).as("c"),
        count(lit(1)).over(b.rangeBetween(Long.MinValue, -y)).as("cs")),
        s"y=-$y")
      // the decomposition fuses onto ONE shared sort: scan + range
      // members, a single exchange
      assert(plan.contains("GlobalScan") && plan.contains("GlobalRange"),
        plan)
      assert("Sort ".r.findAllIn(plan).size == 1, plan)
    }
  }

  test("lookahead totals (y FOLLOWING) match the native window") {
    for (y <- Seq(2L, 25L)) {
      parity(b => df(1500).select(col("t"), col("rid"),
        sum(col("v")).over(b.rangeBetween(Long.MinValue, y)).as("s"),
        count(col("v")).over(b.rangeBetween(Long.MinValue, y)).as("c")),
        s"y=+$y")
    }
  }

  test("null guard: a frame whose regions cancel yields NULL, not 0") {
    // every v in the first plateau is null -> for early rows the
    // half-bounded frame holds rows but no values: native sum is NULL
    val d = Seq((0L, None), (0L, None), (5L, Some(7L)), (9L, Some(1L)))
      .toDF("t", "v").repartition(3)
      .withColumn("rid", monotonically_increasing_id())
    // RANGE frames forbid multi-column ORDER BY; window over t alone
    // (peer-group values are tie-invariant), rows compared under a
    // total (t, rid) output sort
    def q(b: WS) = d.select(col("t"), col("rid"),
      sum(col("v")).over(b.rangeBetween(Long.MinValue, -1L)).as("s"),
      count(col("v")).over(b.rangeBetween(Long.MinValue, -1L)).as("c"))
    val native = q(wN).orderBy(col("t"), col("rid")).collect().toSeq
    val got = q(w).orderBy(col("t"), col("rid")).collect().toSeq
    assert(got == native)
    // and the row at t=5 sees only the null plateau: NULL sum, count 0
    val r5 = got.find(_.getLong(0) == 5L).get
    assert(r5.isNullAt(2) && r5.getLong(3) == 0L, r5)
  }

  test("decimal sums are never decomposed: non-ANSI overflow nulls out " +
    "(Coalesce would read it as 0) and the long-domain family rules " +
    "could not distribute the members anyway") {
    def q() = df(300).select(col("t"), col("rid"),
      sum(col("v").cast("decimal(20,2)"))
        .over(w.rangeBetween(Long.MinValue, -2L)).as("s"))
    for (ansi <- Seq("true", "false")) {
      spark.conf.set("spark.sql.ansi.enabled", ansi)
      try {
        val p = q().queryExecution.executedPlan.toString
        assert(p.contains("Window"),
          s"ansi=$ansi: decimal half-bounded sum was decomposed:\n$p")
      } finally spark.conf.set("spark.sql.ansi.enabled", "true")
    }
  }

  test("NULL order keys: their own peer-group frame, and non-null rows " +
    "include the leading null group — exactly WindowExec's semantics") {
    val d = Seq[(java.lang.Long, Long)]((null, 100L), (null, 10L),
      (2L, 1L), (3L, 2L), (5L, 4L), (5L, 8L))
      .toDF("t", "v").repartition(3)
      .withColumn("rid", monotonically_increasing_id())
    // pmod(t, 1) is NULL for null keys — the usual twin would segregate
    // the null rows into their own partition and (only for UNBOUNDED
    // lower bounds) silently change the answer; coalesce keeps one
    // partition while staying non-foldable
    val wN0 = org.apache.spark.sql.expressions.Window
      .partitionBy(coalesce(pmod(col("t"), lit(1)), lit(0L)))
      .orderBy(col("t"))
    for (y <- Seq(-1L, -2L, 2L)) {
      def q(b: WS) = d.select(col("t"), col("rid"),
        sum(col("v")).over(b.rangeBetween(Long.MinValue, y)).as("s"),
        count(col("v")).over(b.rangeBetween(Long.MinValue, y)).as("c"),
        count(lit(1)).over(b.rangeBetween(Long.MinValue, y)).as("cs"))
      val nq = q(wN0)
      assert(nq.queryExecution.executedPlan.toString.contains("Window"))
      val native = nq.orderBy(col("t"), col("rid")).collect().toSeq
      val r = q(w)
      assert(!r.queryExecution.executedPlan.toString.contains("Window"),
        s"y=$y kept WindowExec")
      assert(r.orderBy(col("t"), col("rid")).collect().toSeq == native,
        s"y=$y")
    }
  }
}
