package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the distributed k-core peel (ops/KCore): exactness
  * against an independent sequential peel, the degree invariant,
  * core nesting, empty-core handling, and the loud round budget. */
class KCoreSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  import graft.ops.KCore

  /** Independent reference: sequential one-vertex-at-a-time peeling
    * (the textbook algorithm the bulk-synchronous rounds must agree
    * with, by deletion-order independence). */
  private def seqCore(edges: Set[(Long, Long)], k: Int)
      : Map[Long, Int] = {
    var adj = edges.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var changed = true
    while (changed) {
      val light = adj.collect { case (v, ns) if ns.size < k => v }.toSet
      changed = light.nonEmpty
      if (changed)
        adj = (adj -- light).map { case (v, ns) => v -> (ns -- light) }
          .filter(_._2.nonEmpty)
    }
    adj.map { case (v, ns) => v -> ns.size }
  }

  private def symDf(edges: Set[(Long, Long)]) =
    (edges ++ edges.map(e => (e._2, e._1))).toSeq.toDF("a", "b")
      .repartition(5)

  /** Deterministic pseudo-random sparse graph (LCG; no Math.random so
    * the case is replayable). */
  private def randomGraph(n: Int, m: Int, seed: Long): Set[(Long, Long)] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    (1 to m).flatMap { _ =>
      val a = math.floorMod(next(), n.toLong)
      val b = math.floorMod(next(), n.toLong)
      if (a == b) None
      else Some((math.min(a, b), math.max(a, b)))
    }.toSet
  }

  test("distributed peel equals the sequential reference on random " +
    "sparse graphs, for several k") {
    for (seed <- Seq(7L, 99L); k <- Seq(2, 3, 4)) {
      val edges = randomGraph(60, 110, seed)
      val want = seqCore(edges ++ edges.map(e => (e._2, e._1)), k)
      val got = KCore.peel(symDf(edges), k, 100)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got == want, s"seed=$seed k=$k")
      // the defining invariant: every survivor keeps degree >= k
      assert(got.values.forall(_ >= k))
    }
  }

  test("cores nest: the 3-core is a subgraph of the 2-core") {
    val edges = randomGraph(80, 160, 3L)
    val c2 = KCore.peel(symDf(edges), 2, 100).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c3 = KCore.peel(symDf(edges), 3, 100).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c3.keySet.subsetOf(c2.keySet))
    // within-core degree can only drop when peeling harder
    assert(c3.forall { case (v, d) => d <= c2(v) })
    // the chained form the registry query uses: peeling the 3-core FROM
    // the 2-core's edges equals peeling it from the full graph
    val chained = KCore.degrees(
        KCore.peelEdges(KCore.peelEdges(symDf(edges), 2, 100), 3, 100))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chained == c3)
  }

  test("a cycle is its own 2-core; a tree's 2-core is empty") {
    val cycle = (0L until 8L).map(i => (i, (i + 1) % 8)).toSet
    val gotCycle = KCore.peel(symDf(cycle), 2, 100).collect()
    assert(gotCycle.length == 8 && gotCycle.forall(_.getLong(1) == 2L))
    // a star (tree): every leaf has degree 1, the cascade consumes it
    val star = (1L to 6L).map(i => (0L, i)).toSet
    assert(KCore.peel(symDf(star), 2, 100).collect().isEmpty)
  }

  test("coreness equals min(cap, max k whose k-core contains the " +
    "vertex), against the sequential reference") {
    for (seed <- Seq(7L, 99L); cap <- Seq(3, 5)) {
      val edges = randomGraph(60, 110, seed)
      val sym = edges ++ edges.map(e => (e._2, e._1))
      val want = sym.map(_._1).map { v =>
        v -> (1 to cap).filter(k => seqCore(sym, k).contains(v)).max.toLong
      }.toMap
      val got = KCore.coreness(symDf(edges), cap, 100)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed=$seed cap=$cap")
      // partition property: every edge-list vertex classified exactly once
      assert(got.keySet == sym.map(_._1))
    }
  }

  test("coreness capping: a triangle at cap=2 reads coreness 2 for all " +
    "three vertices; at cap=3 the true core number 2 reappears") {
    val tri = Set((0L, 1L), (1L, 2L), (0L, 2L))
    val at2 = KCore.coreness(symDf(tri), 2, 100).collect()
    assert(at2.length == 3 && at2.forall(_.getLong(1) == 2L))
    val at3 = KCore.coreness(symDf(tri), 3, 100).collect()
    assert(at3.length == 3 && at3.forall(_.getLong(1) == 2L))
  }

  test("a too-small round budget fails loudly on a long cascade chain") {
    // path graph: 2-core peeling eats one vertex from each end per
    // round — a 20-vertex path needs ~10 rounds to empty
    val path = (0L until 19L).map(i => (i, i + 1)).toSet
    intercept[IllegalArgumentException] {
      KCore.peel(symDf(path), 2, 3).collect()
    }
    // with budget, it converges to the correct empty core
    assert(KCore.peel(symDf(path), 2, 100).collect().isEmpty)
  }
}
