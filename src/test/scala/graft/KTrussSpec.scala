package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the distributed k-truss peel (ops/KTruss): exactness
  * against an independent one-edge-at-a-time sequential peel (deletion-
  * order independence), the support invariant, truss-in-core nesting,
  * clique/cycle edge cases, and the loud round budget. */
class KTrussSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  import graft.ops.{KCore, KTruss}

  private def norm(e: (Long, Long)): (Long, Long) =
    (math.min(e._1, e._2), math.max(e._1, e._2))

  private def adj(es: Set[(Long, Long)]): Map[Long, Set[Long]] =
    (es ++ es.map(e => (e._2, e._1))).groupBy(_._1)
      .map { case (v, ns) => v -> ns.map(_._2) }

  /** Independent reference: remove ONE under-supported edge at a time
    * (the textbook peel the bulk-synchronous rounds must agree with). */
  private def seqTruss(edges: Set[(Long, Long)], k: Int)
      : Map[(Long, Long), Int] = {
    var es = edges.map(norm)
    var done = false
    while (!done) {
      val a = adj(es)
      es.find { case (x, y) => (a(x) intersect a(y)).size < k - 2 } match {
        case Some(e) => es -= e
        case None => done = true
      }
    }
    val fin = adj(es)
    es.map { case (x, y) => (x, y) -> (fin(x) intersect fin(y)).size }.toMap
  }

  private def edgeDf(edges: Set[(Long, Long)]) =
    edges.map(norm).toSeq.toDF("a", "b").repartition(5)

  private def randomGraph(n: Int, m: Int, seed: Long): Set[(Long, Long)] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    (1 to m).flatMap { _ =>
      val a = math.floorMod(next(), n.toLong)
      val b = math.floorMod(next(), n.toLong)
      if (a == b) None else Some(norm((a, b)))
    }.toSet
  }

  test("distributed peel equals the sequential one-edge-at-a-time " +
    "reference on random graphs, for k = 3 and 4") {
    for (seed <- Seq(5L, 41L); k <- Seq(3, 4)) {
      val edges = randomGraph(30, 140, seed)
      val want = seqTruss(edges, k)
      val got = KTruss.peel(edgeDf(edges), k, 100).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toInt).toMap
      assert(got == want, s"seed=$seed k=$k")
      // the defining invariant: every surviving edge keeps support >= k-2
      assert(got.values.forall(_ >= k - 2))
    }
  }

  test("trusses nest, and the k-truss sits inside the (k-1)-core") {
    val edges = randomGraph(30, 150, 11L)
    def truss(k: Int) = KTruss.peelEdges(edgeDf(edges), k, 100).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t3 = truss(3); val t4 = truss(4)
    assert(t4.subsetOf(t3))
    // vertex containment: k-truss vertices are (k-1)-core vertices
    val sym = edgeDf(edges)
    val core3 = KCore.peel(
        sym.unionAll(sym.select($"b".as("a"), $"a".as("b"))), 3, 100)
      .collect().map(_.getLong(0)).toSet
    val t4verts = t4.flatMap(e => Set(e._1, e._2))
    assert(t4verts.subsetOf(core3))
  }

  test("a clique is its own truss at every k up to its size; a " +
    "triangle-free cycle has an empty 3-truss") {
    val k5 = (for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)).toSet
    for (k <- 3 to 5) {
      val got = KTruss.peel(edgeDf(k5), k, 100).collect()
      assert(got.length == 10 && got.forall(_.getLong(2) == 3L), s"k=$k")
    }
    assert(KTruss.peel(edgeDf(k5), 6, 100).collect().isEmpty)
    val cycle = (0L until 8L).map(i => (i, (i + 1) % 8)).toSet
    assert(KTruss.peel(edgeDf(cycle), 3, 100).collect().isEmpty)
  }

  test("a too-small round budget fails loudly on a multi-round cascade " +
    "with a nonempty fixpoint") {
    // K5 with two pendant triangles chained off vertex 4: round 1 drops
    // the four support-1 pendant edges, which STRANDS (5,6) (support 2
    // before, 0 after) — it falls in round 2, and round 3 certifies the
    // K5 fixpoint. A budget of 2 exits still-shrinking on a nonempty
    // edge set and must fail loudly, never return the unconverged set.
    val k5 = (for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)).toSet
    val g = k5 ++ Set((4L, 5L), (4L, 6L), (5L, 6L), (5L, 7L), (6L, 7L))
    intercept[IllegalArgumentException] {
      KTruss.peel(edgeDf(g), 4, 2).collect()
    }
    val got = KTruss.peel(edgeDf(g), 4, 100).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.keySet == k5 && got.values.forall(_ == 3L))
    // a strip of triangles (i, i+1, i+2): its 3-truss is the whole strip
    // (every edge in >= 1 triangle, no peeling), its 4-truss is empty
    // (every skip edge has support exactly 1, so one round clears them
    // and the next clears the triangle-free remainder)
    val strip = (0L until 13L).map(i => (i, i + 1)).toSet ++
      (0L until 12L).map(i => (i, i + 2))
    assert(KTruss.peel(edgeDf(strip), 3, 100).collect()
      .length == strip.size)
    assert(KTruss.peel(edgeDf(strip), 4, 100).collect().isEmpty)
  }
}
