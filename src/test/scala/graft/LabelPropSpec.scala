package graft

import graft.ops.LabelProp
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The adaptive-frontier LPA must be EXACT: frontier rounds recompute
  * affected nodes over their full neighbor-label multiset, so forcing
  * the frontier on (fraction 1.0) and off (fraction 0.0 = always full)
  * must agree label-for-label on every graph — converging or
  * oscillating — and the stats must show the frontier actually
  * engaging (shrinking changed counts, early exit at convergence). */
class LabelPropSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** symmetric edge list from undirected pairs */
  private def sym(pairs: Seq[(Long, Long)]): DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("a", "b")

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // two 4-cliques bridged by one edge: converges in a few rounds
  private val cliques = sym(
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (11L, 12L), (11L, 13L), (11L, 14L), (12L, 13L), (12L, 14L),
      (13L, 14L),
      (4L, 11L)))

  // a 4-cycle is bipartite: synchronous LPA oscillates forever
  private val square = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))

  test("frontier rounds equal full rounds on a converging graph") {
    for (rounds <- Seq(2, 3, 5)) {
      val full = labelMap(LabelProp.propagate(cliques, rounds, 0.0))
      val frontier = labelMap(LabelProp.propagate(cliques, rounds, 1.0))
      assert(frontier == full, s"rounds=$rounds")
    }
  }

  test("frontier rounds equal full rounds on an oscillating graph") {
    for (rounds <- Seq(2, 3)) {
      val full = labelMap(LabelProp.propagate(square, rounds, 0.0))
      val frontier = labelMap(LabelProp.propagate(square, rounds, 1.0))
      assert(frontier == full, s"rounds=$rounds")
    }
  }

  test("the frontier engages, shrinks, and converges early") {
    val (_, stats, _) = LabelProp.propagateStats(cliques, 10, 1.0)
    // round 1 (full) changes most nodes; later (frontier) rounds must
    // shrink to zero well before the 10-round budget — the early exit
    assert(stats.length < 10, s"never converged: $stats")
    assert(stats.last == 0L, s"loop must end on a zero round: $stats")
    assert(stats.head > stats.last, s"no shrink: $stats")
    // skipped rounds are no-ops: a longer budget gives the same labels
    val at = labelMap(LabelProp.propagate(cliques, 10, 1.0))
    val more = labelMap(LabelProp.propagate(cliques, 20, 1.0))
    assert(at == more)
  }

  test("oscillating graph flips en masse every round (the adaptive " +
    "rule's reason to stay full)") {
    val (_, stats, _) = LabelProp.propagateStats(square, 4, 0.0)
    // all 4 nodes change label in every synchronous round
    assert(stats == Seq(4L, 4L, 4L, 4L), stats.toString)
  }

  test("adaptive/full/frontier all equal a plain-Scala reference on a " +
    "200-node pseudo-random graph") {
    // independent oracle: synchronous majority-min LPA computed locally
    val n = 200L
    val pairs = (for {
      i <- 1L to n
      j <- Seq((i * 7919L) % n + 1L, (i * 104729L) % n + 1L)
      if i != j
    } yield (math.min(i, j), math.max(i, j))).distinct
    val edges = sym(pairs)
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val rounds = 4
    var ref = adj.keys.map(k => k -> k).toMap
    for (_ <- 1 to rounds) {
      ref = adj.map { case (node, nbrs) =>
        val best = nbrs.groupBy(ref).map { case (l, xs) => (l, xs.size) }
          .toSeq.maxBy { case (l, c) => (c, -l) }._1
        node -> best
      }
    }
    for (frac <- Seq(0.0, 0.125, 1.0)) {
      val got = labelMap(LabelProp.propagate(edges, rounds, frac))
      assert(got == ref, s"fraction=$frac diverges from the reference")
    }
  }

  test("the switch boundary: fractions straddling round-1's changed " +
    "count flip the round-2 strategy without changing any label") {
    // learn the graph's round-1 changed count and node count, then pin
    // fractions an epsilon on either side of changed/n: below it round
    // 2 must stay FULL, above it round 2 must go FRONTIER — and the
    // labels must be identical (the adaptive rule only picks WORK,
    // never answers). This is the spec coverage for the
    // DefaultFrontierFraction constant's switch condition.
    // round 1 relabels every node (all start self-labeled), so the
    // first PARTIAL changed count is round 2's — straddle that and
    // observe round 3's strategy flip
    val (_, statsFull, _) = LabelProp.propagateStats(cliques, 2, 0.0)
    val c2 = statsFull(1)
    val n = cliques.select("a").distinct().count()
    assert(c2 > 0 && c2 < n, s"need a partial round-2 change: $c2/$n")
    val below = (c2 - 0.5) / n // changed > n*below  -> round 3 FULL
    val above = (c2 + 0.5) / n // changed <= n*above -> round 3 FRONTIER
    val (lblB, _, stratB) = LabelProp.propagateStats(cliques, 3, below)
    val (lblA, _, stratA) = LabelProp.propagateStats(cliques, 3, above)
    assert(stratB.take(3) == Seq("full", "full", "full"),
      stratB.toString)
    assert(stratA.take(3) == Seq("full", "full", "frontier"),
      stratA.toString)
    assert(labelMap(lblB) == labelMap(lblA),
      "labels diverge across the strategy switch")
  }

  test("clique labels: each clique collapses to its min member") {
    val got = labelMap(LabelProp.propagate(cliques, 5, 1.0))
    // both cliques stabilize on their minimum id (ties break to the
    // smallest label); the bridge nodes stay with their cliques
    assert(Set(got(1L), got(2L), got(3L)) == Set(1L))
    assert(Set(got(12L), got(13L), got(14L)) == Set(11L))
  }
}
