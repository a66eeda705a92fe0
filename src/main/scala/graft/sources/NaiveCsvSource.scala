package graft.sources

import graft.ops.NaiveCsv
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Naive-CSV source/sink — the engine's equivalent of the reference's
  * `TextInputFormat` scan + `TextOutputFormat` sink
  * (`/root/reference/src/StockCount.java:80-81`).
  *
  * NOT `spark.read.csv`: the reference's splitting is quote-blind with
  * trailing-empty dropping (Java `String.split`), and the header row is
  * data. This reader keeps those semantics while still giving named
  * columns, and the scan itself is a plain distributed text scan
  * (`FileSourceScanExec`) with the split as a codegen'd projection.
  */
object NaiveCsvSource {

  /** Raw line scan: one `value: string` row per `\n`-line, header included. */
  def lines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Named positional columns over the Java-split fields. Index is 0-based;
    * negative counts from the end (-1 = last field, as the reference's
    * ticker extraction). Rows whose arity doesn't cover an index get null
    * for that column (element_at out-of-bounds -> null under ANSI-off). */
  def read(spark: SparkSession, path: String,
           cols: Seq[(String, Int)],
           minFields: Int = 0): DataFrame = {
    val arr = NaiveCsv.javaSplit(col("value"))
    val base = lines(spark, path).select(arr.as("_f"))
    val filtered = if (minFields > 0) base.where(size(col("_f")) >= minFields)
      else base
    filtered.select(cols.map { case (name, idx) =>
      val at = if (idx >= 0) idx + 1 else idx // element_at is 1-based/-end
      when(size(col("_f")) > math.max(idx, -idx - 1),
        trim(element_at(col("_f"), at))).as(name)
    }: _*)
  }

  /** Single-file text sink (≙ the reference's one default reducer). Only
    * the final, already-small formatted output is coalesced — upstream
    * stages keep full parallelism. */
  def writeTextSingle(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").text(path)
}
