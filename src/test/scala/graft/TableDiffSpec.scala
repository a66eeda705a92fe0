package graft

import graft.ops.TableDiff
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TableDiffSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("merkleDiff equals the naive full-outer symmetric difference " +
    "under random inserts/deletes/updates") {
    val rnd = new scala.util.Random(5)
    val old = (0L until 3000L).map(k => (k, rnd.nextLong(1000000)))
    val oldMap = old.toMap
    // mutate ~5%: delete, update, insert under fresh keys
    val deleted = oldMap.keys.filter(_ => rnd.nextDouble() < 0.02).toSet
    val updated = oldMap.keys
      .filter(k => !deleted(k) && rnd.nextDouble() < 0.02).toSet
    val insertedKeys = (5000L until 5030L).toSet
    val nw = (oldMap -- deleted).map { case (k, v) =>
      (k, if (updated(k)) v + 1 else v)
    } ++ insertedKeys.map(k => (k, rnd.nextLong(1000000)))
    val got = TableDiff.merkleDiff(
      old.toDF("key", "val").repartition(6),
      nw.toSeq.toDF("key", "val").repartition(4))
      .as[(Long, String)].collect().toSet
    val want = deleted.map((_, "deleted")) ++
      updated.map((_, "modified")) ++ insertedKeys.map((_, "inserted"))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("merkleDiff of identical replicas is empty (no phase-2 work)") {
    val df = (0L until 500L).map(k => (k, k * 7)).toDF("key", "val")
    assert(TableDiff.merkleDiff(df, df).count() == 0)
  }

  test("sparse diffs localize: a single changed key flags exactly one " +
    "bucket and phase 2 filters both sides to it") {
    // range-backed (a LocalRelation would evaluate the bucket filter
    // eagerly and hide the plan shape)
    val old = spark.range(2048).select(col("id").as("key"),
      col("id").as("val"))
    val nw = spark.range(2048).select(col("id").as("key"),
      when(col("id") === 777L, -1L).otherwise(col("id")).as("val"))
    val diff = TableDiff.merkleDiff(old, nw, buckets = 256)
    assert(diff.as[(Long, String)].collect().toSet == Set((777L, "modified")))
    // the phase-2 plan carries the single-bucket IN filter on both scans
    // pushdown rewrites the filter onto the scan column; 777 % 256 = 9
    val plan = diff.queryExecution.optimizedPlan.toString
    val hits = "pmod\\([^)]+, 256\\) = 9\\)".r.findAllIn(plan).size
    assert(hits >= 2, s"expected bucket-9 filters on both sides:\n$plan")
  }
}
