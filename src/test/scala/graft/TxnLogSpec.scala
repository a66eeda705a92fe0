package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the transaction log (sources/TxnLog): serial create-
  * exclusive commits, snapshot resolution as pure log algebra, content
  * identity across a compaction commit, O(transaction) change sets, and
  * the vacuum retention floor (head stays readable; time travel below
  * the floor fails at READ, never silently returns partial data). */
class TxnLogSpec extends AnyFunSuite {
  import TestSpark.spark
  import graft.sources.TxnLog
  import org.apache.spark.sql.functions._

  private def freshTable(tag: String): (String, String, Seq[String]) = {
    val root = TestSpark.scratchDir(s"graft-txnlog-$tag").toString
    val logDir = s"$root/_log"
    val objs = (0 to 2).map { i =>
      val d = s"$root/o$i"
      spark.range(i * 100L, (i + 1) * 100L).toDF("id")
        .withColumn("payload", md5(col("id").cast("string")))
        .write.mode("overwrite").parquet(d)
      d
    }
    (root, logDir, objs)
  }

  test("commit: serial history enforced, create-exclusive on replay") {
    val (_, logDir, o) = freshTable("serial")
    assert(TxnLog.latestVersion(spark, logDir) == -1L)
    TxnLog.commit(spark, logDir, 0L, adds = Seq(o(0)))
    // version gaps and duplicates both fail before any file is visible
    intercept[IllegalArgumentException] {
      TxnLog.commit(spark, logDir, 2L, adds = Seq(o(1)))
    }
    intercept[IllegalArgumentException] {
      TxnLog.commit(spark, logDir, 0L, adds = Seq(o(1)))
    }
    TxnLog.commit(spark, logDir, 1L, adds = Seq(o(1)))
    assert(TxnLog.latestVersion(spark, logDir) == 1L)
    // the atomic-publish backstop: a racing writer that passed the serial
    // check still loses on the exclusive create of the commit file
    intercept[java.io.IOException] {
      val f = new org.apache.hadoop.fs.Path(logDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.create(new org.apache.hadoop.fs.Path(
        logDir, f"${1L}%020d.commit"), false)
    }
  }

  test("two writers racing the same version: exactly one commit " +
    "publishes, the log holds exactly one file for it") {
    val (_, logDir, o) = freshTable("race")
    TxnLog.commit(spark, logDir, 0L, adds = Seq(o(0)))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val losses = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = Seq(o(1), o(2)).map { obj =>
      new Thread(() => {
        barrier.await()
        try { TxnLog.commit(spark, logDir, 1L, adds = Seq(obj)); wins.incrementAndGet() }
        catch {
          // loser fails either at the serial check (saw the winner's
          // commit) or at the create-exclusive publish (raced past it)
          case _: IllegalArgumentException | _: java.io.IOException =>
            losses.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1 && losses.get() == 1, s"${wins.get()}/${losses.get()}")
    val log = TxnLog.readLog(spark, logDir)
    assert(log.count(_.version == 1L) == 1, log.toString)
    // the winner's object is the live one; no partial commit leaked
    assert(TxnLog.liveFiles(log, 1L).size == 2)
  }

  test("liveFiles: add/remove algebra, corruption fails loudly") {
    val a = Seq(
      TxnLog.Action(0, "add", "p0"),
      TxnLog.Action(1, "add", "p1"),
      TxnLog.Action(2, "remove", "p0"),
      TxnLog.Action(2, "add", "p2"))
    assert(TxnLog.liveFiles(a, 0) == Seq("p0"))
    assert(TxnLog.liveFiles(a, 1) == Seq("p0", "p1"))
    assert(TxnLog.liveFiles(a, 2) == Seq("p1", "p2"))
    intercept[IllegalArgumentException] { TxnLog.liveFiles(a, 3) }
    intercept[IllegalArgumentException] {
      TxnLog.liveFiles(a :+ TxnLog.Action(3, "add", "p1"), 3)
    }
    intercept[IllegalArgumentException] {
      TxnLog.liveFiles(a :+ TxnLog.Action(3, "remove", "p0"), 3)
    }
  }

  test("compaction commit is a content no-op; every older version intact") {
    val (root, logDir, o) = freshTable("compact")
    TxnLog.commit(spark, logDir, 0L, adds = Seq(o(0), o(1)))
    TxnLog.commit(spark, logDir, 1L, adds = Seq(o(2)))
    val compacted = s"$root/c01"
    spark.read.parquet(o(0), o(1)).coalesce(1)
      .write.mode("overwrite").parquet(compacted)
    TxnLog.commit(spark, logDir, 2L, adds = Seq(compacted),
      removes = Seq(o(0), o(1)))

    val before = TxnLog.readSnapshot(spark, logDir, 1L)
    val after = TxnLog.readSnapshot(spark, logDir, 2L)
    assert(after.count() == 300L)
    assert(before.exceptAll(after).isEmpty && after.exceptAll(before).isEmpty)
    // v0 still resolves to the pre-compaction objects
    assert(TxnLog.liveFiles(TxnLog.readLog(spark, logDir), 0L) ==
      Seq(o(0), o(1)))
  }

  test("changedBetween: O(transaction) footprint, in-range add+remove " +
    "cancels") {
    val a = Seq(
      TxnLog.Action(0, "add", "p0"),
      TxnLog.Action(1, "add", "p1"),     // ingested...
      TxnLog.Action(2, "remove", "p1"),  // ...then compacted away in-range
      TxnLog.Action(2, "add", "p2"),
      TxnLog.Action(3, "remove", "p0"),
      TxnLog.Action(3, "add", "p3"))
    // (0, 2]: p1 cancels out — its content sits identically on both sides
    assert(TxnLog.changedBetween(a, 0, 2) == (Seq("p2"), Seq[String]()))
    assert(TxnLog.changedBetween(a, 2, 3) == (Seq("p3"), Seq("p0")))
    intercept[IllegalArgumentException] { TxnLog.changedBetween(a, 2, 2) }
  }

  test("idempotentCommit: a replayed external txn id refuses; uncommitted " +
    "objects are invisible to log-resolved reads") {
    val (root, logDir, o) = freshTable("idem")
    assert(TxnLog.idempotentCommit(spark, logDir, 0L, adds = Seq(o(0))))
    assert(TxnLog.idempotentCommit(spark, logDir, 1L, adds = Seq(o(1))))
    // the at-least-once replay: same version re-presented -> refused,
    // log byte-identical (no new commit file, same live set)
    assert(!TxnLog.idempotentCommit(spark, logDir, 0L, adds = Seq(o(2))))
    assert(TxnLog.latestVersion(spark, logDir) == 1L)
    assert(TxnLog.liveFiles(TxnLog.readLog(spark, logDir), 1L) ==
      Seq(o(0), o(1)))
    // a crashed writer's half-written object: present in the directory,
    // named by no commit -> the snapshot read never sees it
    spark.range(5).toDF("id")
      .withColumn("payload", lit("GARBAGE"))
      .write.mode("overwrite").parquet(s"$root/orphan")
    val snap = TxnLog.readSnapshot(spark, logDir, 1L)
    assert(snap.count() == 200L)
    assert(snap.where(col("payload") === "GARBAGE").isEmpty)
  }

  test("vacuum: retention floor keeps every snapshot >= retain readable; " +
    "time travel below the floor fails at read") {
    val (root, logDir, o) = freshTable("vacuum")
    TxnLog.commit(spark, logDir, 0L, adds = Seq(o(0), o(1)))
    val rewrite = s"$root/o1_rw"
    spark.read.parquet(o(1)).where(col("id") % 2 === 0)
      .write.mode("overwrite").parquet(rewrite)
    TxnLog.commit(spark, logDir, 1L, adds = Seq(rewrite),
      removes = Seq(o(1)))
    TxnLog.commit(spark, logDir, 2L, adds = Seq(o(2)))

    // removed at v1 <= retain=1 -> reclaimable; nothing else is
    assert(TxnLog.vacuumCandidates(TxnLog.readLog(spark, logDir), 1L) ==
      Seq(o(1)))
    val deleted = TxnLog.vacuum(spark, logDir, 1L)
    assert(deleted == Seq(o(1)))

    // snapshots at and above the floor are fully readable
    assert(TxnLog.readSnapshot(spark, logDir, 1L).count() == 150L)
    assert(TxnLog.readSnapshot(spark, logDir, 2L).count() == 250L)
    // below the floor: resolution still names o(1), the read fails loudly
    intercept[org.apache.spark.sql.AnalysisException] {
      TxnLog.readSnapshot(spark, logDir, 0L).count()
    }
  }
}
