package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement utility: single-partition `row_number()` window vs the
  * planned GlobalRank operator on the same total order, timed to the noop
  * sink (full evaluation, nothing collected). Quantifies what
  * [[graft.plans.GlobalRankRule]] buys when it rewrites the former into
  * the latter. Usage: runMain graft.RankCompare [sfDir] */
object RankCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val n = li.count() // warm the page cache so both paths read warm data

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(label: String)(build: => org.apache.spark.sql.DataFrame): Double = {
      val t = (1 to 2).map(_ => time(
        build.write.format("noop").mode("overwrite").save())).min
      println(f"[rankcompare] $label%-22s $t%8.3f s  ($n rows)")
      t
    }

    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    val windowSec = run("single-partition window")(
      li.withColumn("rank", row_number().over(w)))
    val globalSec = run("GlobalRank operator")(
      graft.plans.GlobalRank.ranked(li, "l_extendedprice" -> true,
        "l_orderkey" -> false, "l_linenumber" -> false))
    println(s"""{"rows":$n,"window_sec":$windowSec,"globalrank_sec":$globalSec}""")
    spark.stop()
  }
}
