package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in distributed batches.
  *
  * The Spark-side plumbing (schema, partition-parallel batch iteration,
  * output shape) is real and tested; the actual media decode is STUBBED
  * behind [[decodeStub]] — this container ships no image/audio codecs. To
  * productionize, replace the stub body with a real decoder (e.g. TwelveMonkeys
  * ImageIO / JavaCV) — every other line stays as is.
  *
  * Scale design: `mapPartitions` processes whole partitions with one
  * decoder instance per task (amortized init), no per-row UDF overhead, no
  * driver involvement; partition count controls decode parallelism.
  */
object Media {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Attach typed metadata to raw (id, kind, payload) rows — the cheap,
    * fully-expression-based part (no decode needed). */
  def withMeta(df: DataFrame, format: String): DataFrame =
    df.select(col("media_id"), col("kind"), col("payload"),
      struct(lit(format).as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        coalesce(length(col("payload")).cast("long"), lit(0L))
          .as("n_bytes")).as("meta"))

  /** STUB decoder: deterministic fake "feature extraction" — 8 floats
    * derived from the payload bytes. Replace the body marked below with a
    * real decoder; the batch shape (Iterator-to-Iterator over partitions,
    * fixed-width float vector out) is the production contract. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    // ---- replace from here with a real decode ----
    if (payload == null || payload.isEmpty) Array.fill(8)(0f)
    else {
      val out = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        out(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out.map(x => x / ((payload.length / 8) + 1))
    }
    // ---- replace to here ----
  }

  /** Partition-parallel feature extraction over the payload column.
    * One decode pass per partition iterator — the `mapInPandas`-style
    * batch contract, JVM edition. */
  def extractFeatures(df: DataFrame): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == "payload") :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { rows =>
      // per-task decoder init would go here (amortized across the partition)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val kept = r.toSeq.zipWithIndex.collect {
          case (v, i) if i != payloadIdx => v
        }
        Row.fromSeq(kept :+ decodeStub(payload).toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Resize stub: deterministic fixed-ratio downsample of the payload
    * (every `factor`-th byte) with metadata updated to the new size — the
    * Spark-side shape of an image resize (payload in, smaller payload +
    * adjusted meta out); swap the byte-sampling expression for a real
    * scaler to productionize. */
  def resizeStub(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("payload",
      when(col("payload").isNull, col("payload"))
        .otherwise(aggregate(
          sampleChunks(col("payload"), 1, factor),
          lit(Array.empty[Byte]),
          (acc, x) => concat(acc, x)))) // binary-safe fold, no string round-trip
      .withColumn("meta", struct(
        col("meta.format"), col("meta.width"), col("meta.height"),
        coalesce(length(col("payload")).cast("long"), lit(0L)).as("n_bytes")))

  /** Frame/sample selection stub for video/audio: keep every `n`-th chunk
    * of the payload (deterministic stand-in for frame sampling); pure
    * expressions, no decode. */
  def sampleChunks(payload: org.apache.spark.sql.Column, chunk: Int,
                   everyNth: Int): org.apache.spark.sql.Column =
    transform(
      filter(sequence(lit(0), (length(payload) / chunk).cast("int")),
        i => i % everyNth === 0),
      i => substring(payload, lit(1) + i * chunk, lit(chunk)))
}
