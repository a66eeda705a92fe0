package graft

import graft.ops.Selection
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Exactness contract of the distributed quantile selection
  * (`Selection.quantileCont`): parity with Spark's built-in exact
  * `percentile()` on skewed, duplicate-heavy and near-ulp data, forced
  * through the multi-round narrowing + bounded gather paths (tiny
  * collectThreshold/buckets), plus the key-semantics regressions from the
  * round-9 review: timestamp/date group columns and null group values
  * must NOT desynchronize the driver's group key from the executors'. */
class SelectionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** quantileCont vs built-in percentile() on the same grouping — both
    * exact, so equality is strict double equality modulo 1-ulp
    * interpolation noise (the two compute `lo + (hi-lo)*frac` in the
    * same order; tolerance covers the built-in's rational-number frac). */
  private def assertParity(df: org.apache.spark.sql.DataFrame,
                           valueCol: String, groupCols: Seq[String],
                           qs: Seq[Double], buckets: Int = 8,
                           collectThreshold: Int = 16): Unit = {
    val names = qs.indices.map(i => s"q_$i")
    val mine = Selection.quantileCont(df, valueCol, groupCols, qs,
      qNames = names, buckets = buckets,
      collectThreshold = collectThreshold)
    val aggs = qs.zip(names).map { case (q, n) =>
      expr(s"percentile($valueCol, ${q}d)").as(n)
    } :+ count(when(col(valueCol).isNotNull &&
      !isnan(col(valueCol).cast("double")), 1)).as("cnt")
    val ref =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val key = (r: Row) => groupCols.indices.map(i =>
      String.valueOf(r.get(r.fieldIndex(groupCols(i))))).mkString("|")
    val mineMap = mine.collect().map(r => key(r) -> r).toMap
    val refMap = ref.collect().map(r => key(r) -> r).toMap
    assert(mineMap.keySet == refMap.keySet,
      s"group sets differ: ${mineMap.keySet} vs ${refMap.keySet}")
    refMap.foreach { case (k, rr) =>
      val mr = mineMap(k)
      names.foreach { n =>
        val a = mr.getDouble(mr.fieldIndex(n))
        val b = rr.getDouble(rr.fieldIndex(n))
        assert(a == b || math.abs(a - b) <= 4 * math.ulp(b),
          s"group $k $n: got $a, built-in percentile $b")
      }
      assert(mr.getLong(mr.fieldIndex("cnt")) ==
        rr.getLong(rr.fieldIndex("cnt")))
    }
  }

  test("parity on skewed high-cardinality doubles (multi-round narrowing)") {
    // log-normal-ish skew: dense near 0, long tail; 20k rows per group
    // with collectThreshold=16 forces several histogram rounds
    val df = spark.range(0, 40000).select(
      (col("id") % 2).cast("string").as("g"),
      (exp(col("id").cast("double") / 4000.0) *
        (col("id") % 997).cast("double")).as("v"))
    assertParity(df, "v", Seq("g"), Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0))
  }

  test("parity on duplicate-heavy integers (gather path, tie plateaus)") {
    // values 1..50 with heavy duplication: ranges collapse to ulp-scale
    // spans whose in-range row count far exceeds collectThreshold — the
    // distinct-level gather bound is what keeps this collectable
    val df = spark.range(0, 30000).select(
      lit("only").as("g"),
      ((col("id") * col("id")) % 50 + 1).cast("double").as("v"))
    assertParity(df, "v", Seq("g"), Seq(0.1, 0.5, 0.77, 0.9))
  }

  test("parity on near-ulp adjacent values") {
    // a cluster of doubles one ulp apart around 1.0: bucket width
    // underflows to 0-progress immediately, exercising the
    // "range can no longer shrink" resolve-by-gather arm
    val base = 1.0
    val vals = (0 until 2000).map(i => base + (i % 5) * math.ulp(base))
    val df = vals.toDF("v").withColumn("g", lit(1))
    assertParity(df, "v", Seq("g"), Seq(0.25, 0.5, 0.75))
  }

  test("timestamp and date group columns do not desync the group key") {
    // regression: the driver used to re-derive the key via
    // String.valueOf(java.sql.Timestamp) (".0" suffix) while executors
    // used cast-to-string — mismatched keys made every histogram see 0
    // in-range rows and throw. Now the key is computed once in Spark.
    val df = spark.range(0, 4000).select(
      timestamp_micros(lit(1700000000000000L) +
        (col("id") % 3) * 86400000000L).as("ts_g"),
      to_date(timestamp_micros(lit(1700000000000000L) +
        (col("id") % 2) * 86400000000L)).as("d_g"),
      col("id").cast("double").as("v"))
    assertParity(df, "v", Seq("ts_g", "d_g"), Seq(0.5, 0.9))
  }

  test("null group values form their own group (not merged, not dropped)") {
    val df = spark.range(0, 3000).select(
      when(col("id") % 3 === 0, lit(null).cast("string"))
        .when(col("id") % 3 === 1, lit("a")).otherwise(lit("b")).as("g"),
      col("id").cast("double").as("v"))
    assertParity(df, "v", Seq("g"), Seq(0.5))
    // and the two-column null patterns (null, "x") vs ("x", null) stay
    // distinct groups — concat_ws would have collided them
    val two = spark.range(0, 2000).select(
      when(col("id") % 2 === 0, lit(null).cast("string"))
        .otherwise(lit("x")).as("g1"),
      when(col("id") % 2 === 0, lit("x"))
        .otherwise(lit(null).cast("string")).as("g2"),
      col("id").cast("double").as("v"))
    val out = Selection.quantileCont(two, "v", Seq("g1", "g2"), Seq(0.5))
    assert(out.count() == 2L)
  }

  test("NaN values are excluded (documented deviation) and nulls skipped") {
    val df = spark.range(0, 1000).select(
      lit("g").as("g"),
      when(col("id") % 10 === 0, lit(Double.NaN))
        .when(col("id") % 10 === 1, lit(null).cast("double"))
        .otherwise(col("id").cast("double")).as("v"))
    val out = Selection.quantileCont(df, "v", Seq("g"), Seq(0.5),
      qNames = Seq("p50"))
    val r = out.head()
    // built-in percentile on the NaN-and-null-free slice is the contract
    val refVal = df.where(!isnan(col("v")) && col("v").isNotNull)
      .agg(expr("percentile(v, 0.5d)")).head().getDouble(0)
    assert(r.getDouble(r.fieldIndex("p50")) == refVal)
    assert(r.getLong(r.fieldIndex("cnt")) == 800L)
  }

  test("ungrouped (global) quantiles work with an empty groupCols") {
    val df = spark.range(0, 5000).select(col("id").cast("double").as("v"))
    assertParity(df, "v", Nil, Seq(0.5, 0.95))
  }

  test("selection internals plan as bounded broadcast-joined " +
    "aggregations — no shuffle join, no unbounded collect") {
    // The scale contract from the scaladoc, pinned on the REAL executed
    // plans of the operator's internal jobs: every data-touching pass is
    // an aggregation (its collect() returns per-(problem, bucket) /
    // per-group rows, never data rows), and the data x problems join is
    // always a broadcast of the model-sized problem table.
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = spark.range(0, 20000).select(
        (col("id") % 3).cast("string").as("g"),
        (col("id") % 1000).cast("double").as("v"))
      Selection.quantileCont(df, "v", Seq("g"), Seq(0.5, 0.9),
        buckets = 8, collectThreshold = 16)
      // the weighted twin runs the same internal shapes — audit it under
      // the same listener (its gather/histogram jobs land in `plans`)
      Selection.weightedQuantile(df.withColumn("w", col("v").cast("long") % 7 + 1),
        "v", "w", Seq("g"), Seq(0.5), buckets = 8, collectThreshold = 16)
      // the listener bus is async: wait for the histogram passes to land
      import scala.jdk.CollectionConverters._
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      while (!plans.asScala.exists(_.contains("BroadcastHashJoin")) &&
        System.nanoTime < deadline) Thread.sleep(50)
      val ps = plans.asScala.toList
      assert(ps.exists(_.contains("BroadcastHashJoin")),
        s"no broadcast-joined histogram pass captured among " +
          s"${ps.size} plans")
      ps.foreach { p =>
        // the one non-aggregation job is the slim (key, value) frame's
        // lazy localCheckpoint materialization — fully distributed, the
        // driver receives nothing; recognized by its projection-only
        // shape (no shuffle, no collect operator)
        val checkpointJob = !p.contains("Exchange") &&
          !p.contains("CollectLimit") && p.contains("Project")
        assert(p.contains("HashAggregate") || p.contains("SortAggregate")
            || checkpointJob,
          s"selection ran a non-aggregation job (unbounded collect):\n$p")
        assert(!p.contains("SortMergeJoin") &&
          !p.contains("ShuffledHashJoin") && !p.contains("CartesianProduct"),
          s"selection shuffled data against the problem table:\n$p")
      }
    } finally spark.listenerManager.unregister(listener)
  }

  /** Driver-side brute-force weighted lower quantile: smallest v whose
    * cumulative weight reaches max(1, ceil(q*W)) — the spec's oracle. */
  private def bruteWeighted(vw: Seq[(Double, Long)], q: Double): Double = {
    val sorted = vw.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val w = sorted.map(_._2).sum
    val k = math.max(1L, math.ceil(q * w.toDouble).toLong)
    var cum = 0L
    sorted.find { case (_, wv) => cum += wv; cum >= k }.get._1
  }

  test("weightedQuantile: parity with brute force through narrowing and " +
    "gather, zero weights unselectable, plateaus, multiple groups") {
    // two groups, duplicate plateaus, zero-weight rows, skewed weights;
    // tiny buckets/threshold force the multi-round narrowing path
    val rows = (0 until 400).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val v = if (i % 7 == 0) 42.0 else (i * 37 % 211) + (i % 5) * 0.25
      val w = if (i % 11 == 0) 0L else (i * 13 % 9) + 1L
      (g, v, w)
    }
    val df = rows.toDF("g", "v", "w").repartition(7)
    val qs = Seq(0.1, 0.5, 0.9)
    val got = Selection.weightedQuantile(df, "v", "w", Seq("g"), qs,
      qNames = Seq("q10", "q50", "q90"), buckets = 8,
      collectThreshold = 16)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    for (g <- Seq("a", "b")) {
      val vw = rows.filter(_._1 == g).map(t => (t._2, t._3))
      val want = (bruteWeighted(vw, 0.1), bruteWeighted(vw, 0.5),
        bruteWeighted(vw, 0.9), vw.map(_._2).sum)
      assert(got(g) == want, s"group $g: ${got(g)} vs $want")
    }
    // a zero-weight value strictly above every positive-weight value can
    // never be selected, even at q = 1.0
    val z = Seq(("g", 1.0, 5L), ("g", 99.0, 0L)).toDF("g", "v", "w")
    val top = Selection.weightedQuantile(z, "v", "w", Seq("g"), Seq(1.0))
      .collect().head.getDouble(1)
    assert(top == 1.0)
  }

  test("weightedQuantile: zero total weight and negative weights throw") {
    val z = Seq(("g", 1.0, 0L)).toDF("g", "v", "w")
    intercept[IllegalArgumentException] {
      Selection.weightedQuantile(z, "v", "w", Seq("g"), Seq(0.5))
    }
    val neg = Seq(("g", 1.0, -2L), ("g", 2.0, 5L)).toDF("g", "v", "w")
    intercept[IllegalArgumentException] {
      Selection.weightedQuantile(neg, "v", "w", Seq("g"), Seq(0.5))
    }
  }

  test("invalid quantiles and empty input are loud / empty, not wrong") {
    val df = Seq(1.0, 2.0).toDF("v").withColumn("g", lit("g"))
    intercept[IllegalArgumentException] {
      Selection.quantileCont(df, "v", Seq("g"), Seq(1.5))
    }
    val empty = df.where(lit(false))
    assert(Selection.quantileCont(empty, "v", Seq("g"), Seq(0.5))
      .count() == 0L)
  }
}
