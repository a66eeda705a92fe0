package graft

/** SINGLE SOURCE OF TRUTH for the registry queries whose *plan
  * construction* itself runs Spark jobs (driver-side model fits,
  * iterate-to-fixpoint loops, scratch-store writes). The plan-census
  * specs must exclude them — calling `queries(name)` there would run
  * dozens of end-to-end jobs just to read a plan string — but an
  * exclusion is a census hole, so EVERY entry carries a justification:
  * adding a name here requires writing down WHY it executes eagerly
  * (the same discipline as PlanAuditSpec's broadcast `declared` map).
  * The excluded queries are not unaudited — each family's functional
  * spec (EmbSpec/DedupSpec/TextSpec/SketchStoreSpec/...) covers its
  * semantics, and the oracle gate covers its results.
  *
  * `stream_*` queries are excluded by prefix at the census sites (the
  * replay gate executes eagerly by design) and are not listed here.
  */
object EagerQueries {
  val justification: Map[String, String] = Map(
    "emb_ivf_search" -> "k-means coarse quantizer fit at construction",
    "emb_knn_cosine" -> "collects the query panel to build the probe",
    "emb_ivf_nprobe_curve" ->
      "collects the 3-row curve for the monotonicity/anchor requires",
    "emb_ivf_assign" -> "k-means centroid fit at construction",
    "emb_centroids" -> "Lloyd iterations run jobs at construction",
    "emb_kmeans" -> "Lloyd iterations run jobs at construction",
    "dedup_connected_components" ->
      "label-convergence loop iterates jobs at construction",
    "rel_kcore" -> "peel-to-fixpoint loop iterates jobs at construction",
    "rel_coreness" -> "iterated peel ladder runs jobs at construction",
    "rel_ktruss" -> "support-peel loop iterates jobs at construction",
    "text_bpe_merges" -> "greedy merge loop: one job per merge round",
    "rel_percentiles" -> "two-pass quantiles: pass 1 at construction",
    "rel_exact_quantiles" -> "distributed selection iterates jobs",
    "rel_winsorized_stats" -> "clip bounds computed by a first pass",
    "rel_equi_depth_hist" -> "bin edges computed by a first pass",
    "rel_outlier_mad" -> "median-of-medians passes at construction",
    "src_manifest_prune" -> "reads the manifest store it first writes",
    "src_time_travel" -> "stages the txn log + data objects, resolves snapshots",
    "src_time_travel_diff" -> "stages the txn log, reads change-set metadata",
    "src_txn_vacuum" -> "stages the txn log and physically vacuums it",
    "src_txn_skipping" ->
      "stages two log-committed batches, prunes from commit stats",
    "src_txn_concurrent" ->
      "stages the txn log, races two OCC writers at construction",
    "src_txn_merge" ->
      "stages the base table, plans + executes the CoW merge rewrite",
    "src_txn_cdf" ->
      "stages the merge history, collects merkle bucket ids to row-diff",
    "src_txn_gc" ->
      "stages the txn log + an orphan, physically sweeps at construction",
    "src_txn_restore" ->
      "stages the txn log and appends the restore commit at construction",
    "src_txn_clone" ->
      "stages source + clone logs, diverges the clone at construction",
    "dedup_txn_incremental_lsh" ->
      "stages a txn-log table + standing index, maintains it from the diff",
    "src_zorder_prune" -> "stages two layouts, collects zone-map manifests",
    "pipeline_fuzzy_dedup" -> "multi-stage pipeline materializes stages",
    "emb_semantic_dedup" -> "centroid fit + threshold pass",
    "emb_hard_negatives" -> "mines against a collected query panel",
    "rel_sketch_roundtrip" -> "writes the scratch parquet partials store",
    "rel_kmv_cap_curve" ->
      "checkpoints the one-row sketch agg, collects the error envelope",
    "rel_qsketch_store" -> "writes the scratch parquet partials store",
  )
  val names: Set[String] = justification.keySet
}
