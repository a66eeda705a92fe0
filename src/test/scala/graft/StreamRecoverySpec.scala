package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint recovery: the durability half of the streaming contract.
  * A stopped query restarted on the SAME checkpoint must resume from its
  * committed offsets with its aggregation state intact — files processed
  * before the stop are not re-read, and the restored state keeps counting
  * on top of what batch 1 accumulated. */
class StreamRecoverySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("aggregation state survives a restart on the RocksDB state store") {
    // the production state backend (bounded memory, native compaction) —
    // the provider is read at query start, so it wraps the whole test
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val in = TestSpark.scratchDir("graft-rdb-in").toString
      val ck = TestSpark.scratchDir("graft-rdb-ck").toString
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("word",
          org.apache.spark.sql.types.StringType)))
      def start(sink: String) =
        spark.readStream.schema(schema).parquet(in)
          .groupBy("word").agg(count(lit(1)).as("cnt"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete").option("checkpointLocation", ck).start()
      Seq("x", "x", "y").toDF("word").write.mode("append").parquet(in)
      val q1 = start("rdb_run1")
      try { q1.processAllAvailable() } finally q1.stop()
      Seq("x", "z").toDF("word").write.mode("append").parquet(in)
      val q2 = start("rdb_run2")
      try {
        q2.processAllAvailable()
        val got = spark.table("rdb_run2").as[(String, Long)].collect().toMap
        // RocksDB-backed state restored across the restart, not recounted
        assert(got == Map("x" -> 3L, "y" -> 1L, "z" -> 1L))
      } finally q2.stop()
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("file-source aggregation resumes from checkpoint after a restart") {
    val in = TestSpark.scratchDir("graft-rec-in").toString
    val ckpt = TestSpark.scratchDir("graft-rec-ck").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("word",
        org.apache.spark.sql.types.StringType)))

    def start(sinkName: String) =
      spark.readStream.schema(schema).parquet(in)
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()

    Seq("a", "a", "b").toDF("word")
      .write.mode("append").parquet(in)
    val q1 = start("rec_run1")
    try { q1.processAllAvailable() } finally q1.stop()
    val afterBatch1 = spark.table("rec_run1").as[(String, Long)]
      .collect().toMap
    assert(afterBatch1 == Map("a" -> 2L, "b" -> 1L))

    // second wave of files lands while the query is DOWN
    Seq("a", "c").toDF("word").write.mode("append").parquet(in)
    val q2 = start("rec_run2")
    try {
      q2.processAllAvailable()
      val resumed = spark.table("rec_run2").as[(String, Long)]
        .collect().toMap
      // restored state ("a" -> 2) + new data, NOT a recount from scratch
      // of only-new files ("a" -> 1) nor a double count of old ones
      assert(resumed == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    } finally q2.stop()
  }
}
