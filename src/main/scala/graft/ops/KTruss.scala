package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition by distributed support peeling — the EDGE-level
  * analog of the k-core (ops/KCore): the k-truss is the maximal subgraph
  * in which every edge participates in at least k-2 triangles (Cohen
  * 2008, "Trusses: cohesive subgraphs for social network analysis").
  * Trusses are the stricter cohesion notion — a k-truss is always inside
  * the (k-1)-core, but filters out the star-like structures a core
  * keeps — and the peel is deletion-order independent for the same
  * reason core peeling is: support only DROPS as edges leave, so the
  * bulk-synchronous fixpoint equals the sequential one.
  *
  * Scale design: each round is one distributed triangle-support count —
  * the edge list joined twice against its symmetric closure on the
  * wedge pattern (x: neighbors of a, y: neighbors of b, x.b = y.b names
  * a common neighbor) — followed by a semi join keeping edges with
  * support >= k-2. All shuffle-partitioned hash joins, no collect; the
  * edge list only shrinks, and the per-round lineage is truncated by
  * `localCheckpoint` (the KCore/LabelProp discipline). Convergence is
  * count equality (peeling only deletes); `maxRounds` turns a
  * pathological cascade into a loud failure. The support join is the
  * O(sum of wedge counts) step every distributed truss algorithm pays —
  * at 100 TB the standard mitigations (degree-ordered orientation so
  * each wedge is generated once) bolt onto the same plan shape.
  */
object KTruss {

  /** Per-edge triangle support within `cur` (directed a < b edge list,
    * no duplicates): count of common neighbors of the endpoints in the
    * symmetric closure. Edges in no triangle simply do not appear. */
  def support(cur: DataFrame): DataFrame = {
    val sym = cur.select(col("a"), col("b"))
      .unionAll(cur.select(col("b").as("a"), col("a").as("b")))
    cur.as("e")
      .join(sym.as("x"), col("x.a") === col("e.a"))
      .join(sym.as("y"),
        col("y.a") === col("e.b") && col("y.b") === col("x.b"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("sup"))
  }

  /** Peel the directed (a < b) edge list to its k-truss's surviving
    * edges. An empty truss is a valid result; a cascade still shrinking
    * after `maxRounds` rounds fails loudly. */
  def peelEdges(edges: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    require(k >= 3, s"k=$k (the 2-truss is every edge)")
    var cur = edges.select(col("a"), col("b")).localCheckpoint(true)
    var curN = cur.count()
    var stable = false
    var rounds = 0
    while (!stable && curN > 0 && rounds < maxRounds) {
      val keep = support(cur).where(col("sup") >= k - 2)
        .select(col("a"), col("b"))
      val next = cur.join(keep, Seq("a", "b"), "left_semi")
        .localCheckpoint(true)
      val nextN = next.count()
      stable = nextN == curN
      cur = next
      curN = nextN
      rounds += 1
    }
    require(stable || curN == 0,
      s"$k-truss peel still shrinking after $maxRounds rounds")
    cur
  }

  /** Peel to the k-truss and read out `(a, b, support)` — each surviving
    * edge with its within-truss triangle count (>= k-2 by construction). */
  def peel(edges: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    val core = peelEdges(edges, k, maxRounds)
    core.join(support(core), Seq("a", "b"))
      .select(col("a"), col("b"), col("sup").as("support"))
  }
}
