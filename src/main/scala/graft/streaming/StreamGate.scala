package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Drives an [[EventStream]] transform through the real Structured
  * Streaming engine (MemoryStream source -> micro-batch execution ->
  * memory sink) and returns the sink contents as a batch DataFrame, so
  * streaming operators can sit in `SparkEntry.queries` and be checked
  * against the same DuckDB oracles as the batch ops.
  *
  * The driver-side `data` Seq is gate scaffolding: it replaces the
  * unbounded source (Kafka/files) the operator would read in production —
  * the operator under test is the streaming transform itself, whose state
  * management (watermarks, incremental aggregation, join buffers) runs
  * exactly as it would on a real stream.
  */
object StreamGate {

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily lowered:
    * a stateful streaming query materializes one state-store instance per
    * shuffle partition and checkpoints each one per micro-batch, so a
    * bounded replay at the session's batch setting (32) pays 32x the
    * checkpoint I/O for kilobytes of state. Production unbounded streams
    * size this to their key cardinality; the replay gate doesn't need to.
    * The conf is read at query START, so it must wrap `start()`. */
  private def withReplayPartitions[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, "4")
    try body finally spark.conf.set(key, old)
  }

  /** Checkpoint dir for a replay: tmpfs when available (every micro-batch
    * fsyncs offset/commit logs and state snapshots — RAM-backed files cut
    * that to memcpy; a production stream would point this at durable
    * storage instead), else the JVM temp dir. Unique per call so reruns
    * never resume a stale query. */
  private def ckptDir(name: String): String = {
    val base = if (new java.io.File("/dev/shm").canWrite) "/dev/shm"
    else System.getProperty("java.io.tmpdir")
    val d = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(base), s"graft-ckpt-$name-")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Replay `data` as one micro-batch through `transform`; `mode` is the
    * sink output mode ("complete" for aggregations — emits the full final
    * state; "append" for joins/dedup — emits exactly-once rows). */
  def replay[T: Encoder](spark: SparkSession, data: Seq[T], name: String,
                         mode: String)(transform: DataFrame => DataFrame)
  : DataFrame = withReplayPartitions(spark) {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[T]
    val q = transform(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode)
      .option("checkpointLocation", ckptDir(name)).start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  /** Like [[replay]] but appends a `flush` batch after the data batch:
    * append-mode sinks only emit rows once the watermark passes them, and
    * the watermark only advances when new data arrives — a far-future
    * sentinel row unsticks the tail of the stream (callers filter it out). */
  def replayWithFlush[T: Encoder](spark: SparkSession, data: Seq[T],
                                  flush: Seq[T], name: String, mode: String)
                                 (transform: DataFrame => DataFrame)
  : DataFrame = withReplayPartitions(spark) {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[T]
    val q = transform(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode)
      .option("checkpointLocation", ckptDir(name)).start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      mem.addData(flush: _*)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  /** Two-source variant of [[replayWithFlush]] for stream-stream joins:
    * both sides get their data and then their watermark-advancing flush. */
  def replayJoin[A: Encoder, B: Encoder](spark: SparkSession,
                                         left: Seq[A], right: Seq[B],
                                         flushLeft: Seq[A], flushRight: Seq[B],
                                         name: String)
                                        (transform: (DataFrame, DataFrame) => DataFrame)
  : DataFrame = withReplayPartitions(spark) {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[A]
    val r = MemoryStream[B]
    val q = transform(l.toDF(), r.toDF()).writeStream
      .format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", ckptDir(name)).start()
    try {
      l.addData(left: _*)
      r.addData(right: _*)
      q.processAllAvailable()
      l.addData(flushLeft: _*)
      r.addData(flushRight: _*)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }
}
