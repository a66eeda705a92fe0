package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sizing contract of the small-file compactor (ops/Compaction): the
  * rewrite targets `ceil(bytes/target)` files derived from the layout's
  * ACTUAL bytes, and is a content no-op. */
class CompactionSpec extends AnyFunSuite {
  import TestSpark.spark
  import graft.ops.Compaction

  test("targetFileCount: ceil division, floored at one file") {
    assert(Compaction.targetFileCount(0L, 1024L) == 1)
    assert(Compaction.targetFileCount(1L, 1024L) == 1)
    assert(Compaction.targetFileCount(1024L, 1024L) == 1)
    assert(Compaction.targetFileCount(1025L, 1024L) == 2)
    assert(Compaction.targetFileCount(10L * 1024L, 1024L) == 10)
    intercept[IllegalArgumentException] {
      Compaction.targetFileCount(1024L, 0L)
    }
  }

  test("compact: collapses a fragmented layout to the computed count, " +
    "content-identically") {
    val root = TestSpark.scratchDir("graft-compact").toString
    val frag = s"$root/frag"
    val out = s"$root/out"
    val df = spark.range(0L, 5000L).toDF("id")
      .withColumn("payload",
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("id").cast("string")))
    df.repartition(64).write.mode("overwrite").parquet(frag)
    assert(Compaction.dataFileCount(spark, frag) == 64)

    val bytes = Compaction.dirBytes(spark, frag)
    assert(bytes > 0L)
    val expected = Compaction.targetFileCount(bytes, 64L * 1024L)
    val written = Compaction.compact(spark, frag, out, 64L * 1024L)
    assert(written == expected,
      s"expected $expected files (ceil($bytes/64KiB)), wrote $written")
    assert(written < 64, "compaction must reduce the file count here")

    // content identity through the rewrite
    val before = spark.read.parquet(frag)
    val after = spark.read.parquet(out)
    assert(after.count() == 5000L)
    assert(before.exceptAll(after).isEmpty && after.exceptAll(before).isEmpty)
  }
}
