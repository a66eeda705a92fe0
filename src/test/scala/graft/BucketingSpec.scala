package graft

import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing: both sides bucketed on the join key means
  * the sort-merge join needs NO shuffle exchange — the 100 TB answer to
  * repeated fact-fact joins on a stable key. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("bucketed-by-key tables join without a shuffle exchange") {
    val a = (0L until 1000L).map(i => (i % 100, s"a$i")).toDF("k", "av")
    val b = (0L until 500L).map(i => (i % 100, s"b$i")).toDF("k", "bv")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    a.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_a")
    b.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_b")
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graft_bucket_a")
          .join(spark.table("graft_bucket_b"), "k")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"))
        assert(!plan.contains("Exchange"),
          s"bucketed join should not shuffle:\n$plan")
        assert(joined.count() == 5000) // 100 keys x 10 x 5
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }
}
