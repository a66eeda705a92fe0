package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: dumps the formatted physical plan of each (or
  * one named) SparkEntry query — the feedback loop for shuffle/pushdown/
  * codegen tuning. Usage: runMain graft.Explain [sfDir] [queryName]. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.lift(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same extension surface as Bench/Verify: the plans dumped here are
      // the plans those sessions execute
      .withExtensions(graft.functions.GraftExtensions.inject)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_ == n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"explain failed: $e") }
      }
    spark.stop()
  }
}
