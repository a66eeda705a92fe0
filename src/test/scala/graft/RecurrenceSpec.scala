package graft

import graft.plans.Recurrence
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed first-order linear recurrence (plans/GlobalRecur):
  * y_i = m_i * y_{i-1} + c_i over a total order via associative affine
  * composition — Long algebra bit-exact, Double algebra within the
  * documented composition tolerance, identity passthrough on null rows,
  * and the two-pass plan shape (one exchange + sort, no single-partition
  * stage). Partition coalescing is disabled where the test NEEDS real
  * boundaries — at this scale AQE otherwise folds the sort into one
  * partition and the splice machinery never runs. */
class RecurrenceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def withRealPartitions[A](body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  test("Long algebra: distributed chain is bit-identical to the " +
    "sequential recurrence (wrapping mod 2^64)") {
    withRealPartitions {
      val n = 5000
      val tok = (0 until n).map(i => (i * 2654435761L) ^ (i >> 3))
      val df = spark.range(0, n).select(col("id"),
          lit(1099511628211L).as("m"))
        .withColumn("c", (col("id") * lit(2654435761L))
          .bitwiseXOR(expr("id div 8").cast("long")))
        .repartition(13)
      val got = Recurrence.scan(df, "m", "c", 7L, ("id", false))
        .orderBy("id").select("y").as[Long].collect()
      var y = 7L
      val want = tok.map { t => y = 1099511628211L * y + t; y }
      assert(got.toSeq == want,
        s"first mismatch at ${got.toSeq.zip(want).indexWhere(p => p._1 != p._2)}")
    }
  }

  test("null m/c rows are identity: state passes through unchanged") {
    withRealPartitions {
      val df = spark.range(0, 100).select(col("id"),
          when(col("id") % 3 =!= 0, lit(3L)).as("m"),
          when(col("id") % 4 =!= 0, col("id")).as("c"))
        .repartition(7)
      val got = Recurrence.scan(df, "m", "c", 1L, ("id", false))
        .orderBy("id").select("y").as[Long].collect()
      var y = 1L
      val want = (0L until 100L).map { i =>
        val m = if (i % 3 != 0) Some(3L) else None
        val c = if (i % 4 != 0) Some(i) else None
        if (m.isDefined && c.isDefined) y = m.get * y + c.get
        y
      }
      assert(got.toSeq == want)
    }
  }

  test("Double algebra: EWMA agrees with the sequential fold within the " +
    "documented composition tolerance") {
    withRealPartitions {
      val n = 4000
      val a = 0.875
      val df = spark.range(0, n).select(col("id"),
          lit(a).as("m"),
          ((col("id") * 31 % 997).cast("double") * (1.0 - a)).as("c"))
        .repartition(11)
      val got = Recurrence.scan(df, "m", "c", 0.0, ("id", false))
        .orderBy("id").select("y").as[Double].collect()
      var y = 0.0
      val want = (0 until n).map { i =>
        y = a * y + (i * 31 % 997).toDouble * (1.0 - a); y
      }
      // fp affine composition reassociates across partition boundaries:
      // agreement is ~ulp/(1-a) relative, NOT bit-exact (the scaladoc
      // contract). 1e-9 relative is ~4 orders of magnitude of headroom.
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w)),
          s"row $i: got $g, sequential $w")
      }
    }
  }

  test("plan shape: one exchange + one sort feed the recurrence, no " +
    "single-partition stage, partitioning preserved for a stacked scan") {
    // repartition first: a bare spark.range is ALREADY range-partitioned
    // and sorted by id, which legitimately satisfies the operator's
    // OrderedDistribution with no exchange at all (nice at scale, but
    // this test pins that the requirement EXISTS)
    val df = spark.range(0, 1000).select(col("id"),
      lit(16777619L).as("m"), (col("id") * 7).as("c")).repartition(9)
    val r = Recurrence.scan(df, "m", "c", 0L, ("id", false))
    val p = r.queryExecution.executedPlan.toString
    assert(p.contains("GlobalRecur"), p)
    assert(!p.contains("Window") && !p.contains("SinglePartition"), p)
    assert("ENSURE_REQUIREMENTS".r.findAllIn(p).size == 1 &&
      "Sort ".r.findAllIn(p).size == 1,
      s"recurrence must plan one range exchange + one sort:\n$p")
  }

  test("registry chain query matches a driver-side sequential reference " +
    "at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("rel_hash_chain_global")(spark, sf)
    val rows = got.orderBy("event_id").collect()
    // reference: the same token stream rebuilt independently of the
    // operator, threaded sequentially on the driver
    val tokDf = {
      val s = spark
      val raw = s.read.parquet(s"$sf/events.parquet")
      val ts = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
      ts.select(unix_micros(col("ts")).as("t"), col("event_id"),
        conv(substring(md5(concat(coalesce(col("event_type"), lit("~")),
          lit(":"),
          coalesce(round(col("value") * 1000).cast("long"), lit(-1L))
            .cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast("long").as("tok"))
        .orderBy("t", "event_id")
    }
    val seq = tokDf.select("event_id", "tok").collect()
    var h = 0L
    val want = seq.map { r =>
      h = 16777619L * h + r.getLong(1)
      (r.getLong(0), h & 4294967295L)
    }.sortBy(_._1)
    val gotPairs = rows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(gotPairs.toSeq == want.toSeq)
  }
}
