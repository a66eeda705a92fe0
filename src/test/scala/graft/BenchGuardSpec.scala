package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench outlier guard's circuit breakers (Bench.scala's
  * BenchGuard): the r16 driver artifact was rc 124 / unparseable because
  * a sustained host stall tripped the guard on query after query and the
  * re-runs multiplied the sweep past the driver's timeout. The property
  * these tests protect: under ANY slowdown pattern the sweep does a
  * BOUNDED amount of extra work, so the bench JSON always gets written.
  * No Spark session — the guard is pure sweep-state. */
class BenchGuardSpec extends AnyFunSuite {

  private val ref = (1 to 20).map(i => s"q$i" -> 1.0).toMap // 20 s total

  test("per-query rule: outlier needs BOTH the K-ratio and the 1 s " +
    "absolute floor; un-guarded queries never trip") {
    val g = new BenchGuard(ref, outlierK = 5.0)
    assert(!g.isOutlier("q1", 4.9))            // under K×
    assert(g.isOutlier("q1", 5.1))             // over both
    assert(!g.isOutlier("q1", -1.0))           // failed run is not an outlier
    assert(!g.isOutlier("brand_new_query", 99.0)) // no reference
    val tiny = new BenchGuard(Map("t" -> 0.1), outlierK = 5.0)
    assert(!tiny.isOutlier("t", 0.9)) // 9x but under the 1 s floor: jitter
    assert(tiny.isOutlier("t", 1.2))
  }

  test("scattered transients: re-runs allowed (max 2 per query), a " +
    "normal guarded reading in between breaks the streak") {
    val g = new BenchGuard(ref, outlierK = 5.0)
    assert(g.mayRerun("q1", 10.0, reranSoFar = 0))
    assert(g.mayRerun("q1", 10.0, reranSoFar = 1))
    assert(!g.mayRerun("q1", 10.0, reranSoFar = 2)) // per-query cap
    g.chargeRerun(10.0); g.queryDone("q1", tripped = true, ok = true)
    g.queryDone("q2", tripped = false, ok = true)   // normal: streak broken
    g.chargeRerun(10.0); g.queryDone("q3", tripped = true, ok = true)
    g.queryDone("q4", tripped = false, ok = true)
    g.chargeRerun(9.0); g.queryDone("q5", tripped = true, ok = true)
    assert(!g.hostStall)
    assert(g.mayRerun("q6", 10.0, reranSoFar = 0)) // 29 < 30 s budget
  }

  test("host stall: 3 consecutive tripped queries disable re-runs for " +
    "the rest of the sweep — bounded extra work, artifact still written") {
    val g = new BenchGuard(ref, outlierK = 5.0)
    Seq("q1", "q2", "q3").foreach { q =>
      assert(g.mayRerun(q, 20.0, 0))
      g.chargeRerun(1.0)
      g.queryDone(q, tripped = true, ok = true)
    }
    assert(g.hostStall)
    // every later outlier finishes single-pass, no matter the budget left
    assert(!g.mayRerun("q4", 50.0, 0))
    // and a stall never un-declares: one normal reading in a stalled host
    // does not re-arm the re-run machinery
    g.queryDone("q5", tripped = false, ok = true)
    assert(g.hostStall && !g.mayRerun("q6", 50.0, 0))
  }

  test("un-guarded (new) queries are blind: they neither extend nor " +
    "break a stall streak") {
    val g = new BenchGuard(ref, outlierK = 5.0)
    g.queryDone("q1", tripped = true, ok = true)
    g.queryDone("new_a", tripped = false, ok = true) // no ref: no signal
    g.queryDone("q2", tripped = true, ok = true)
    g.queryDone("new_b", tripped = false, ok = true)
    g.queryDone("q3", tripped = true, ok = true)
    assert(g.hostStall)
  }

  test("global budget: total re-run seconds bounded by max(30, 10% of " +
    "the committed total) — a slow-bleed of weatherable transients " +
    "cannot double the sweep") {
    // big registry: 1000 s committed -> 100 s budget
    val big = (1 to 100).map(i => s"q$i" -> 10.0).toMap
    val g = new BenchGuard(big, outlierK = 5.0)
    assert(g.rerunBudgetSec == 100.0)
    // interleave trips with normal readings so stall mode never arms,
    // and charge the budget down
    var i = 0
    while (g.rerunSpentSec < g.rerunBudgetSec) {
      i += 1
      assert(g.mayRerun(s"q${(i % 100) + 1}", 60.0, 0))
      g.chargeRerun(25.0)
      g.queryDone(s"q${(i % 100) + 1}", tripped = true, ok = true)
      g.queryDone(s"q${((i + 1) % 100) + 1}", tripped = false, ok = true)
    }
    assert(!g.hostStall)           // never 3 consecutive
    assert(!g.mayRerun("q7", 60.0, 0)) // budget spent: single-pass now
    assert(g.rerunSpentSec <= g.rerunBudgetSec + 25.0) // one overshoot max
    // small registry floor
    assert(new BenchGuard(ref, 5.0).rerunBudgetSec == 30.0)
  }
}
