package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous majority label propagation (LPA) with an ADAPTIVE
  * frontier — exact, never approximate: every round produces labels
  * bit-identical to the textbook full synchronous round; only the WORK
  * adapts to how much actually changed.
  *
  * Each node starts labeled with itself; a round relabels every node
  * with the MAJORITY label among its neighbors (smallest label on count
  * ties, via max of (cnt, -lbl)). Two execution strategies per round:
  *
  *  - FULL: join all edges to current labels, aggregate — O(edges)
  *    shuffle. Always used for round 1 and whenever the previous
  *    round's changed set is large.
  *  - FRONTIER: when few labels changed, only the AFFECTED nodes
  *    (neighbors of the changed set) can change next — recompute the
  *    majority for those nodes over ALL their incident edges (the full
  *    neighbor-label multiset, which is what makes it exact) and keep
  *    everyone else's label through a co-partitioned left-outer merge.
  *    Every shuffle is frontier-sized: O(edges incident to affected).
  *
  * The strategy choice is made from the MEASURED changed count of the
  * previous round (a cheap count on the already-materialized merge
  * result), not guessed from the plan — some graphs converge fast
  * (cliquey similarity graphs: frontier wins), others oscillate
  * forever (bipartite graphs under synchronous updates flip en masse
  * every round — measured on the customer–supplier co-order graph:
  * 15999/15999 nodes change in EVERY round, so a frontier there never
  * shrinks and an unconditional frontier is pure overhead; it also
  * holds a second edge copy that an 8 GiB ×30 run cannot afford).
  * `changedCount == 0` ends the loop early — stable labels stay stable
  * under a synchronous round, so skipped rounds are no-ops and the
  * fixed-round semantics are preserved exactly.
  *
  * Scale shape: the edge list is hash-partitioned on the source BEFORE
  * its one-time localCheckpoint (checkpoint preserves physical
  * partitioning), so changed⨝edges and the label merge are
  * co-partitioned zero-exchange joins; the destination-partitioned
  * copy needed by the frontier recompute is materialized LAZILY on
  * first engagement, so graphs that never take the frontier path never
  * pay for it.
  *
  * `edgesIn` must be the SYMMETRIC (a, b) edge list (both directions
  * present). Returns (node, lbl).
  */
object LabelProp {

  /** Switch threshold: a round runs FRONTIER iff the previous round's
    * changed count is <= nNodes/8. Why 1/8 is safe for BOTH measured
    * graph classes (not derived per-graph — justified by the cost
    * asymmetry):
    *
    *  - A frontier round runs ~3 frontier-sized shuffle stages
    *    (affected-set build, incident-edge recompute, label lookup)
    *    where a full round runs 1 full-edge stage, and the first
    *    frontier round also pays the one-time dest-partitioned edge
    *    copy. The frontier only wins decisively when the affected
    *    set's INCIDENT EDGES are well under E/3; since the affected
    *    set fans out from the changed set by up to the average degree,
    *    requiring changed <= n/8 keeps the recompute safely under
    *    break-even even with ~3x degree fan-out.
    *  - The penalty for a WRONG choice is bounded and self-correcting:
    *    choosing FULL when frontier would win costs at most the full
    *    round we could always afford (the oscillating co-order graph
    *    lives here permanently, changed = n every round, and never
    *    dips near n/8); choosing FRONTIER wrongly costs <= ~3x one
    *    full round, once, and the NEXT round re-decides from that
    *    round's measured count. Converging graphs (cliquey similarity
    *    graphs) crash through 1/8 within a round or two of converging,
    *    so the threshold's exact value only shifts the switch by ~one
    *    round — LabelPropSpec pins exactness on both sides of the
    *    boundary.
    */
  val DefaultFrontierFraction = 0.125

  def propagate(edgesIn: DataFrame, rounds: Int,
                frontierFraction: Double = DefaultFrontierFraction)
  : DataFrame =
    propagateStats(edgesIn, rounds, frontierFraction,
      collectStats = false)._1

  /** As [[propagate]], also returning the per-round changed counts —
    * the observable a spec needs to prove the frontier actually
    * engaged (counts after the first are the frontier-trigger inputs)
    * — and the per-round strategy chosen ("full" | "frontier"), the
    * observable a spec needs to cover the switch boundary itself.
    * `collectStats = false` (the [[propagate]] path) skips the FINAL
    * round's changed count: it feeds no strategy decision and no early
    * exit, so it would be a pure extra pass over the merge result.
    */
  def propagateStats(edgesIn: DataFrame, rounds: Int,
                     frontierFraction: Double = DefaultFrontierFraction,
                     collectStats: Boolean = true)
  : (DataFrame, Seq[Long], Seq[String]) = {
    val edges = edgesIn.select(col("a"), col("b"))
      .repartition(col("a")).localCheckpoint(false)
    // destination-partitioned copy for the frontier recompute, built
    // only if the frontier ever engages
    var edgesB: DataFrame = null
    var labels = edges.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint(false)
    val nNodes = labels.count() // labels is materialized: cheap
    // majority label over (b, lbl) pairs; min label on count ties.
    // (A pre-repartition by b — one exchange serving both aggregates
    // instead of an exchange each — A/B'd NEUTRAL at sf0.1: the raw
    // rows it shuffles cost what the saved exchange of partial-agg
    // rows saved. Kept in the two-aggregate form, whose map-side
    // partial aggregation is the right 100 TB default.)
    def argmax(bLbl: DataFrame): DataFrame = bLbl
      .groupBy(col("b"), col("lbl")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("b"))
      .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
      .select(col("b"), (-col("m.nl")).as("new_lbl"))
    var changed: DataFrame = null
    var changedCount = nNodes // round 1 is always full
    val stats = scala.collection.mutable.ArrayBuffer.empty[Long]
    val strategies = scala.collection.mutable.ArrayBuffer.empty[String]
    var round = 1
    while (round <= rounds && changedCount > 0) {
      val useFull =
        round == 1 || changedCount > nNodes * frontierFraction
      strategies += (if (useFull) "full" else "frontier")
      val newLbl =
        if (useFull)
          argmax(labels.join(edges, col("node") === col("a"))
            .select(col("b"), col("lbl")))
        else {
          if (edgesB == null)
            edgesB = edges.repartition(col("b")).localCheckpoint(false)
          // nodes with at least one changed neighbor...
          val affected = changed
            .join(edges, col("node") === col("a")) // co-partitioned
            .select(col("b")).distinct()
            .select(col("b").as("ab"))
          // ...recomputed over ALL their incident edges (exact
          // majority); every shuffle here is frontier-sized
          argmax(affected
            .join(edgesB, col("ab") === col("b")) // co-partitioned
            .select(col("b"), col("a"))
            .join(labels, col("a") === col("node"))
            .select(col("b"), col("lbl")))
        }
      // node-partitioned both sides: zero-exchange merge; nodes the
      // frontier did not recompute keep their label
      val merged = labels
        .join(newLbl, col("node") === col("b"), "left_outer")
        .select(col("node"), col("lbl").as("old_lbl"),
          coalesce(col("new_lbl"), col("lbl")).as("lbl"))
        .localCheckpoint(false)
      changed = merged.where(col("old_lbl") =!= col("lbl"))
        .select(col("node"))
      if (round < rounds || collectStats) {
        changedCount = changed.count() // merged is materialized: cheap
        stats += changedCount
      }
      labels = merged.select(col("node"), col("lbl"))
      round += 1
    }
    (labels, stats.toSeq, strategies.toSeq)
  }
}
