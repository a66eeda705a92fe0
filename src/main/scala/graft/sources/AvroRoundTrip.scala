package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Distributed Avro container-file source + sink built on the Avro
  * mapreduce formats (`avro` / `avro-mapred` ship with Spark's jars; the
  * separate `spark-avro` DataSource module does not, and this environment
  * resolves no external artifacts). With `spark-avro` on the classpath
  * this whole object collapses to `df.write.format("avro")` /
  * `spark.read.format("avro")` — the query surface in SparkEntry would
  * not change.
  *
  * Both directions are fully distributed: the executors write one Avro
  * container file per partition through `saveAsNewAPIHadoopFile` and read
  * them back through `AvroKeyInputFormat` splits; the driver only carries
  * the schema JSON. The RDD hop is the genuine imperative boundary here —
  * no built-in declarative source speaks this byte format — and it
  * bounds the non-codegen region to the format edge itself.
  *
  * Supported field types: the flat primitives the engine's tables use
  * (long / int / double / float / string / boolean, nullable).
  */
object AvroRoundTrip {

  /** Avro record schema (JSON) mirroring a flat Spark schema, fields in
    * struct order — so positional `put`/`get` aligns on both sides. */
  def avroSchemaJson(schema: StructType, name: String): String = {
    def prim(dt: DataType): String = dt match {
      case LongType => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case BooleanType => "\"boolean\""
      case StringType => "\"string\""
      case other =>
        throw new IllegalArgumentException(s"unsupported Avro field: $other")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null", ${prim(f.dataType)}]"""
      else prim(f.dataType)
      s"""{"name": "${f.name}", "type": $t}"""
    }.mkString(", ")
    s"""{"type": "record", "name": "$name", "fields": [$fields]}"""
  }

  /** Distributed write: one Avro container file per partition. The target
    * directory is removed first (Hadoop output committers refuse to write
    * into an existing path), so re-runs — e.g. the bench's repeat loop —
    * behave like `mode("overwrite")`. */
  def write(df: DataFrame, dir: String): Unit = {
    val json = avroSchemaJson(df.schema, "graft_record")
    val sc = df.sparkSession.sparkContext
    val job = Job.getInstance(sc.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(json))
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(sc.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    df.rdd.mapPartitions { it =>
      // Schema is not Serializable: ship the JSON, parse once per task
      val schema = new Schema.Parser().parse(json)
      it.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < row.length) { rec.put(i, row.get(i)); i += 1 }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(dir, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Distributed read of a directory of Avro container files into a
    * DataFrame with the given (flat) schema. */
  def read(spark: SparkSession, dir: String, schema: StructType)
  : DataFrame = {
    val json = avroSchemaJson(schema, "graft_record")
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, new Schema.Parser().parse(json))
    val n = schema.length
    val rows = spark.sparkContext.newAPIHadoopFile(
        dir + "/part-*",
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        job.getConfiguration)
      .mapPartitions { it =>
        it.map { case (k, _) =>
          val rec = k.datum()
          // copy every field out NOW: the record reader reuses the datum
          val vals = new Array[Any](n)
          var i = 0
          while (i < n) {
            vals(i) = rec.get(i) match {
              case u: org.apache.avro.util.Utf8 => u.toString
              case v => v
            }
            i += 1
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
