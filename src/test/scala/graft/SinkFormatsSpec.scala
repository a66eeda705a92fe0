package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth: every self-contained format Spark ships
  * (parquet, orc, json-lines, csv, text) round-trips schema + values, and
  * a stream can target any batch sink via foreachBatch. */
class SinkFormatsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rows = Seq((1L, "a,b \"quoted\"", 1.5), (2L, "plain", -0.25),
    (3L, "", 0.0))

  test("avro container round-trip: values, nulls, and overwrite re-run") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("n", IntegerType), StructField("v", DoubleType)))
    val data = Seq(Row(1L, "a,b \"quoted\"", 7, 1.5),
      Row(2L, null, null, -0.25), Row(3L, "", 0, 0.0))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), schema)
    val dir = TestSpark.scratchDir("graft-avro").toString + "/files"
    sources.AvroRoundTrip.write(df, dir)
    // second write must behave like mode("overwrite"), not fail on the
    // existing output dir (the bench repeat loop re-runs every query)
    sources.AvroRoundTrip.write(df, dir)
    val back = sources.AvroRoundTrip.read(spark, dir, schema)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    assert(back.collect().toSet == data.toSet)
  }

  test("parquet / orc / json round-trip schema and values exactly") {
    val df = rows.toDF("id", "s", "v")
    for (fmt <- Seq("parquet", "orc", "json")) {
      val dir = TestSpark.scratchDir(s"graft-$fmt").toString
      df.write.mode("overwrite").format(fmt).save(dir)
      val back = spark.read.format(fmt)
        .schema(df.schema) // json infers types otherwise
        .load(dir)
      // sources re-read primitives as nullable; names/types must survive
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        df.schema.map(f => (f.name, f.dataType)), fmt)
      assert(back.as[(Long, String, Double)].collect().toSet == rows.toSet,
        fmt)
    }
  }

  test("csv round-trips with RFC-4180 quoting (unlike the naive reference " +
    "split, which is provided separately for parity)") {
    val df = rows.toDF("id", "s", "v")
    val dir = TestSpark.scratchDir("graft-csv").toString
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(df.schema).csv(dir)
    // embedded commas and quotes survive a quote-aware round trip
    assert(back.as[(Long, String, Double)].collect().toSet ==
      rows.map { case (i, s, v) => (i, if (s.isEmpty) null else s, v) }.toSet)
  }

  test("native streaming file sink appends exactly-once via its commit log") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val outDir = TestSpark.scratchDir("graft-filesink").toString
    val ckDir = TestSpark.scratchDir("graft-filesink-ck").toString
    val mem = MemoryStream[(Long, String)]
    def run(data: Seq[(Long, String)]): Unit = {
      val q = mem.toDF().toDF("id", "s").writeStream
        .outputMode("append").format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .start()
      try { mem.addData(data: _*); q.processAllAvailable() } finally q.stop()
    }
    run(Seq((1L, "x"), (2L, "y")))
    // second query instance resumes from the SAME checkpoint: the sink's
    // _spark_metadata commit log must not double-count the first batch
    run(Seq((3L, "z")))
    val out = spark.read.parquet(outDir)
    assert(out.count() == 3)
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("foreachBatch routes a stream into an arbitrary batch sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val outDir = TestSpark.scratchDir("graft-febatch").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "s").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
        org.apache.spark.sql.Row], batchId: Long) =>
        // any batch sink works here: parquet append partitioned by batch
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", TestSpark.scratchDir("graft-febatch-ck").toString)
      .start()
    try {
      mem.addData((1L, "x"), (2L, "y"))
      q.processAllAvailable()
      mem.addData((3L, "z"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir)
    assert(out.count() == 3)
    assert(out.select("batch_id").distinct().count() == 2) // two batches
  }
}
