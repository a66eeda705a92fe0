package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout-level scale behaviors: partition pruning on partitioned writes
  * and AQE's runtime skew-join splitting. At 100 TB these decide whether a
  * query reads 1/365th of the data or all of it, and whether one reducer
  * gets a mega-key or eight share it. */
class PartitionPruningSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("hive-partitioned write + filter -> PartitionFilters prune the scan") {
    val dir = TestSpark.scratchDir("graft-part").toString
    (0 until 1000).map(i => (i.toLong, s"en${i % 3}", s"body $i"))
      .toDF("id", "lang", "body")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)

    val df = spark.read.parquet(dir).where(col("lang") === "en1")
    val p = df.queryExecution.executedPlan.toString
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]].*"),
      s"expected non-empty PartitionFilters:\n$p")
    // the partition predicate must NOT survive as a post-scan data filter
    assert(!p.matches("(?s).*PushedFilters: \\[[^\\]]*lang.*"), p)
    assert(df.count() == 333)

    // pruning is physical: only the matching partition directory is listed
    val files = df.select(input_file_name()).distinct()
      .as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains("lang=en1")),
      files.mkString("\n"))
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val olds = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one mega-key (90% of rows) vs a uniform right side
      val big = (0 until 60000)
        .map(i => (if (i % 10 == 0) i % 100L else 7L, s"pad-$i-${"x" * 40}"))
        .toDF("k", "payload")
      val dim = (0L until 100L).map(k => (k, s"d$k")).toDF("k", "dv")
      val joined = big.join(dim, "k")
      // collect() executes THIS plan (count() would wrap it in a new one
      // and leave this AdaptiveSparkPlan unexecuted / un-replanned)
      assert(joined.collect().length == 60000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n$p")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
