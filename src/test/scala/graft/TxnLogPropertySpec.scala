package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the TxnLog's log algebra (pure, except the
  * FS-backed checkpoint-GC property): on RANDOM VALID histories,
  * snapshot resolution must equal a brute-force replay at every
  * version, and `changedBetween` must
  * satisfy the liveness-delta identity
  * `live(v1) == (live(v0) \ removed) ∪ added` for every version pair —
  * the contract an incremental consumer relies on. The re-add case
  * (remove then add the same path inside a window, a net add) is what
  * a naive added∩removed cancellation gets wrong — this suite caught
  * exactly that in the first implementation.
  *
  * Deterministic: fixed scalacheck seeds, explicit draws (the house
  * idiom of GlobalWindowPropertySpec); a failure names its seed. */
class TxnLogPropertySpec extends AnyFunSuite {
  import graft.sources.TxnLog
  import TxnLog.Action

  /** Random valid history: each commit adds 0-2 fresh paths, may
    * RE-add a previously-removed path (the restore/undo shape), and
    * may remove one currently-live path; at least one action per
    * commit (commit() rejects empty ones). */
  private val genHistory: Gen[Seq[Action]] = {
    def step(v: Long, live: Vector[String], dead: Vector[String],
             next: Int, acc: Vector[Action], remaining: Int)
    : Gen[Seq[Action]] =
      if (remaining == 0) Gen.const(acc)
      else for {
        nAdd <- Gen.choose(0, 2)
        reAdd <- if (dead.nonEmpty) Gen.oneOf(true, false)
                 else Gen.const(false)
        readdIdx <- Gen.choose(0, math.max(0, dead.size - 1))
        doRemove <- if (live.nonEmpty) Gen.oneOf(true, false)
                    else Gen.const(false)
        removeIdx <- Gen.choose(0, math.max(0, live.size - 1))
        forceAdd = nAdd == 0 && !reAdd && !doRemove
        fresh = (0 until (if (forceAdd) 1 else nAdd))
          .map(i => s"p${next + i}")
        reAdded = if (reAdd) Seq(dead(readdIdx)) else Nil
        removed = if (doRemove) Seq(live(removeIdx)) else Nil
        out <- step(v + 1,
          (live ++ fresh ++ reAdded).filterNot(removed.contains),
          (dead.filterNot(reAdded.contains) ++ removed).distinct,
          next + fresh.size,
          acc ++ fresh.map(Action(v, "add", _)) ++
            reAdded.map(Action(v, "add", _)) ++
            removed.map(Action(v, "remove", _)),
          remaining - 1)
      } yield out
    Gen.choose(2, 12).flatMap(n =>
      step(0L, Vector.empty, Vector.empty, 0, Vector.empty, n))
  }

  private def draw(seed: Long): Seq[Action] =
    genHistory.apply(Gen.Parameters.default, Seed(seed)).get

  /** Brute-force liveness at `v`: replay the prefix into a set. */
  private def bruteLive(log: Seq[Action], v: Long): Set[String] =
    log.takeWhile(_.version <= v).foldLeft(Set.empty[String]) {
      case (s, Action(_, "add", p, _, _)) => s + p
      case (s, Action(_, "remove", p, _, _)) => s - p
      case (s, _) => s
    }

  test("liveFiles equals the brute-force replay at every version, on " +
    "200 random valid histories") {
    for (seed <- 1L to 200L) {
      val log = draw(seed)
      log.map(_.version).distinct.foreach { v =>
        assert(TxnLog.liveFiles(log, v).toSet == bruteLive(log, v),
          s"seed=$seed v=$v log=$log")
      }
    }
  }

  test("changedBetween satisfies the liveness-delta identity for every " +
    "version pair, including re-adds, on 200 random valid histories") {
    for (seed <- 1L to 200L) {
      val log = draw(seed)
      val versions = log.map(_.version).distinct
      for (v0 <- versions; v1 <- versions if v0 < v1) {
        val (added, removed) = TxnLog.changedBetween(log, v0, v1)
        val got = (bruteLive(log, v0) -- removed) ++ added
        assert(got == bruteLive(log, v1),
          s"seed=$seed ($v0,$v1] log=$log added=$added removed=$removed")
        // each path is one NET op: no repeats, no overlap
        assert(added.distinct == added && removed.distinct == removed &&
          (added.toSet intersect removed.toSet).isEmpty,
          s"seed=$seed ($v0,$v1] added=$added removed=$removed")
      }
    }
  }

  test("checkpointed resolution equals full-replay resolution at every " +
    "(checkpoint, asOf) pair of 200 random valid histories") {
    for (seed <- 1L to 200L) {
      val log = draw(seed)
      val versions = log.map(_.version).distinct
      for (c <- versions; asOf <- versions if asOf >= c) {
        // a checkpoint at c is exactly the live ADD set at c; resolution
        // replays only the tail (c, asOf] on top of it
        val base = TxnLog.liveActions(log, c)
        val tail = log.filter(a => a.version > c && a.version <= asOf)
        val viaCheckpoint = TxnLog.replayActions(base, tail)
        val full = TxnLog.liveActions(log, asOf)
        assert(viaCheckpoint == full,
          s"seed=$seed c=$c asOf=$asOf log=$log")
      }
    }
  }

  test("vacuum never reclaims a path live in ANY snapshot >= retain " +
    "(re-adds included), and reclaims every truly-dead below-floor " +
    "removal, on 200 random valid histories") {
    for (seed <- 1L to 200L) {
      val log = draw(seed)
      val versions = log.map(_.version).distinct
      for (retain <- versions) {
        val cands = TxnLog.vacuumCandidates(log, retain).toSet
        // safety: no candidate is referenced by a retained snapshot
        versions.filter(_ >= retain).foreach { s =>
          val overlap = cands intersect bruteLive(log, s)
          assert(overlap.isEmpty,
            s"seed=$seed retain=$retain snapshot=$s would lose $overlap")
        }
        // completeness: a path removed at <= retain whose history never
        // adds it again is reclaimable
        val expected = log.collect {
          case Action(v, "remove", p, _, _) if v <= retain => p
        }.distinct.filter { p =>
          !log.exists(a =>
            a.path == p && a.action == "add" && a.version > retain) &&
            log.filter(a => a.path == p && a.version <= retain)
              .last.action == "remove"
        }.toSet
        assert(cands == expected, s"seed=$seed retain=$retain log=$log")
      }
    }
  }

  test("schemaAt is last-meta-wins and meta actions never perturb the " +
    "file live set, on 200 random valid histories") {
    for (seed <- 1L to 200L) {
      val base = draw(seed)
      val versions = base.map(_.version).distinct
      // interleave a meta (schema) action at every third version — meta
      // rides the same log but lives in its own namespace
      val withMeta = base.flatMap { a =>
        if (a.version % 3 == 0 && base.indexOf(a) ==
            base.indexWhere(_.version == a.version))
          Seq(Action(a.version, "meta", s"schema-v${a.version}"), a)
        else Seq(a)
      }
      versions.foreach { v =>
        val lastMeta = versions.filter(x => x % 3 == 0 && x <= v)
          .maxOption.map(x => s"schema-v$x")
        assert(TxnLog.schemaAt(withMeta, v) == lastMeta,
          s"seed=$seed v=$v")
        assert(TxnLog.liveFiles(withMeta, v).toSet == bruteLive(base, v),
          s"seed=$seed v=$v meta actions perturbed the live set")
      }
    }
  }

  test("resolution survives checkpoint GC at every (keep, asOf) pair: " +
    "a checkpoint is a shortcut, never state (FS-backed, 25 histories)") {
    import TestSpark.spark
    for (seed <- 1L to 25L) {
      val log = draw(seed)
      val versions = log.map(_.version).distinct
      val root = TestSpark.scratchDir(s"graft-txnlog-gcprop-$seed")
      val logDir = s"$root/_log"
      // replay the generated history onto a real log, checkpoint every 2
      versions.foreach { v =>
        val vActs = log.filter(_.version == v)
        TxnLog.commit(spark, logDir, v,
          adds = vActs.filter(_.action == "add").map(_.path),
          removes = vActs.filter(_.action == "remove").map(_.path),
          checkpointEvery = 2)
      }
      val expected = versions.map(v => v -> TxnLog.liveFiles(log, v)).toMap
      for (keep <- Seq(2, 1)) {
        TxnLog.gcCheckpoints(spark, logDir, keep)
        versions.foreach { v =>
          assert(TxnLog.liveFilesAt(spark, logDir, v) == expected(v),
            s"seed=$seed keep=$keep asOf=$v")
        }
      }
    }
  }

  test("the concrete re-add shapes the naive cancellation gets wrong") {
    val log = Seq(
      Action(0, "add", "a"), Action(0, "add", "b"),
      Action(1, "remove", "b"), // b compacted away...
      Action(2, "add", "b"))    // ...then restored
    // remove + re-add inside (0, 2]: net NO change
    assert(TxnLog.changedBetween(log, 0, 2) ==
      (Seq.empty[String], Seq.empty[String]))
    // b is dead at v1 and re-added at v2: net ADD over (1, 2]
    assert(TxnLog.changedBetween(log, 1, 2) ==
      (Seq("b"), Seq.empty[String]))
    // only the remove falls in (0, 1]: net REMOVE
    assert(TxnLog.changedBetween(log, 0, 1) ==
      (Seq.empty[String], Seq("b")))
  }

  /** Inject a deletion-vector swap (remove + re-add of one live path
    * with a GROWN vector) at every third version of a generated
    * history — the merge-on-read delete shape. Deterministic: the
    * lexicographically-first live path is swapped. */
  private def withDvSwaps(log: Seq[Action]): Seq[Action] = {
    val versions = log.map(_.version).distinct
    var live = Map.empty[String, Option[String]] // path -> dv
    versions.flatMap { v =>
      val acts = log.filter(_.version == v)
      acts.foreach {
        case Action(_, "add", p, _, _) => live += p -> None
        case Action(_, "remove", p, _, _) => live -= p
        case _ => ()
      }
      if (v % 3 == 0 && live.nonEmpty) {
        val p = live.keys.toSeq.min
        val grown = Some(live(p).map(_ + ",").getOrElse("") + s"f:$v")
        live += p -> grown
        acts ++ Seq(Action(v, "remove", p),
          Action(v, "add", p, None, grown))
      } else acts
    }
  }

  test("deletion vectors are liveness-neutral, survive checkpointed " +
    "resolution, and dvChangedBetween reports exactly the live-both-" +
    "ends vector changes, on 200 random valid histories") {
    for (seed <- 1L to 200L) {
      val base = draw(seed)
      val log = withDvSwaps(base)
      val versions = log.map(_.version).distinct
      // brute dv state at v: last add's vector for each live path
      def bruteDv(v: Long): Map[String, Option[String]] =
        log.takeWhile(_.version <= v)
          .foldLeft(Map.empty[String, Option[String]]) {
            case (m, Action(_, "add", p, _, d)) => m + (p -> d)
            case (m, Action(_, "remove", p, _, _)) => m - p
            case (m, _) => m
          }
      versions.foreach { v =>
        // the swap never perturbs the live set...
        assert(TxnLog.liveFiles(log, v).toSet == bruteLive(base, v),
          s"seed=$seed v=$v")
        // ...and resolution serves the swap's vector
        assert(TxnLog.liveActions(log, v)
          .map(a => a.path -> a.dv).toMap == bruteDv(v),
          s"seed=$seed v=$v")
      }
      // checkpointed resolution carries vectors identically
      for (c <- versions; asOf <- versions if asOf >= c) {
        val viaCkpt = TxnLog.replayActions(TxnLog.liveActions(log, c),
          log.filter(a => a.version > c && a.version <= asOf))
        assert(viaCkpt == TxnLog.liveActions(log, asOf),
          s"seed=$seed c=$c asOf=$asOf")
      }
      // dvChangedBetween == the brute force over every pair
      for (v0 <- versions; v1 <- versions if v0 < v1) {
        val before = bruteDv(v0); val after = bruteDv(v1)
        val expected = after.keySet.intersect(before.keySet)
          .filter(p => before(p) != after(p))
        assert(TxnLog.dvChangedBetween(log, v0, v1)
          .map(_._1).toSet == expected,
          s"seed=$seed ($v0,$v1]")
      }
    }
  }
}
