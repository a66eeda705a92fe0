package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every large corpus
  * needs. Streaming sinks, per-task outputs, and incremental ingest leave
  * directories with millions of tiny files; at 100 TB, scan throughput and
  * planning time degrade with file COUNT (driver-side listing, per-file
  * open cost, under-filled scan tasks), not bytes. The compactor rewrites
  * a directory into size-targeted files.
  *
  * Scale design: the target file count is derived from the layout's
  * ACTUAL bytes (`ceil(totalBytes / targetFileBytes)`), never a magic
  * constant — the same call that collapses a fragmented test directory to
  * a handful of files yields ~totalBytes/1 GB files on a production
  * corpus. The rewrite itself is one round-robin `repartition(n)` (an
  * exchange that moves each row once, no key skew by construction)
  * followed by a parallel write; driver state is the file listing only.
  * `maxRecordsPerFile` is deliberately not used as the primary mechanism:
  * it caps rows per file but cannot MERGE many small files into one task's
  * output the way an explicit repartition does.
  */
object Compaction {

  /** Total bytes of the data files under `dir` (driver-side listing — the
    * same listing any scan of the directory performs). */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).iterator
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
  }

  /** Data files under `dir` (compaction's before/after file-count view). */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(s =>
      s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
  }

  /** `ceil(totalBytes / targetFileBytes)`, floored at one file. */
  def targetFileCount(totalBytes: Long, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, s"targetFileBytes=$targetFileBytes")
    math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
  }

  /** Rewrite the parquet directory `in` as `out` with files sized toward
    * `targetFileBytes` (compressed-bytes heuristic: output files inherit
    * the input's compression ratio, so input bytes are the right sizing
    * signal). Returns the file count written. */
  def compact(spark: SparkSession, in: String, out: String,
      targetFileBytes: Long): Int = {
    val n = targetFileCount(dirBytes(spark, in), targetFileBytes)
    spark.read.parquet(in).repartition(n)
      .write.mode("overwrite").parquet(out)
    dataFileCount(spark, out)
  }
}
