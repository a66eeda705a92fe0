package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (JVM-wide, forked by sbt). */
object TestSpark {

  /** Temp dir for test scratch (sinks, checkpoints, staged inputs),
    * recursively deleted when the forked test JVM exits —
    * `File.deleteOnExit` can't remove non-empty directories, so raw
    * `createTempDirectory` calls would leak one dir per test per run. */
  def scratchDir(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    scratch.synchronized { scratch += d }
    d
  }
  private val scratch = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    scratch.synchronized(scratch.foreach(d =>
      graft.streaming.StreamGate.deleteRecursively(d.toString)))))

  lazy val spark: SparkSession = {
    // same extension surface as the Bench/Verify/Explain sessions, so
    // plan pins in the specs hold for the production configuration
    val s = SparkSession.builder()
      // local[4, 2]: allow ONE task retry, so TaskRetrySpec can inject a
      // first-attempt failure and prove the custom two-pass operators are
      // retry-exact. Behavior-neutral for every other test: a retry only
      // happens after a task failure, and tests that expect job failure
      // still fail (after one extra attempt).
      .master("local[4, 2]")
      .appName("graft-test")
      .withExtensions(graft.functions.GraftExtensions.inject)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", scratchDir("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
