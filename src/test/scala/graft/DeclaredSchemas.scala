package graft

/** Declared output schemas for the EAGER registry queries — the census
  * escape hatch the r13 ADVICE note planned and the r14 verdict asked
  * for. Constructing a `stream_*` query runs a full micro-batch replay
  * and constructing an [[EagerQueries]] entry runs model fits /
  * fixpoint loops / scratch-store writes, so reading their schemas
  * end-to-end made RegistryIntegritySpec's schema census run dozens of
  * sf0.001 jobs. The census now reads THESE declared strings for the
  * eager set (and still constructs every lazy query's plan, which is
  * cheap); the queries themselves remain fully covered by the oracle
  * gate, which executes all of them every round.
  *
  * Integrity is guarded in three directions (RegistryIntegritySpec):
  *  - every eager query (stream_* prefix or EagerQueries entry) MUST
  *    have a declared schema here — no silent census hole;
  *  - every entry here MUST name a current eager registry query — no
  *    stale or misplaced declarations;
  *  - with `SPARK_GRAFT_FULL_CENSUS=1` the census constructs the eager
  *    queries end-to-end and requires each declared string to equal
  *    the live `schema.simpleString` bit-for-bit. Run the deep mode
  *    after ANY change to an eager query's output shape (and once per
  *    round before the freeze); the failure message prints the
  *    corrected map entries verbatim.
  *
  * Values are Spark `StructType.simpleString` — exact, order-
  * sensitive, and flat (the census rejects any `array<`/`map<`/
  * `struct<` occurring inside the declared row type, the same
  * harness-unhashable-column rule the lazy half enforces on live
  * schemas).
  */
object DeclaredSchemas {
  // regenerate with: SPARK_GRAFT_FULL_CENSUS=1 sbt -batch
  //   "testOnly graft.RegistryIntegritySpec"
  val map: Map[String, String] = Map(
    "dedup_connected_components" ->
      "struct<doc_id:bigint,component:bigint>",
    "emb_centroids" ->
      "struct<label:int,pos:bigint,m:double>",
    "emb_hard_negatives" ->
      "struct<qid:bigint,vec_id:bigint,cos:double>",
    "emb_ivf_assign" ->
      "struct<vec_id:bigint,assigned:int,cos:double>",
    "emb_ivf_search" ->
      "struct<vec_id:bigint,label:int,cos:double>",
    "emb_ivf_nprobe_curve" ->
      "struct<nprobe:bigint,n_candidates:bigint,n_overlap:bigint,recall_at_10:double>",
    "emb_kmeans" ->
      "struct<vec_id:bigint,cluster:bigint,cos:double>",
    "emb_knn_cosine" ->
      "struct<vec_id:bigint,cos:double>",
    "emb_semantic_dedup" ->
      "struct<label:int,n_vecs:bigint,n_kept:bigint>",
    "pipeline_fuzzy_dedup" ->
      "struct<lang:string,n_docs:bigint,n_kept:bigint,n_tokens_kept:bigint>",
    "rel_equi_depth_hist" ->
      "struct<bucket:bigint,cnt:bigint,lo:double,hi:double>",
    "rel_exact_quantiles" ->
      "struct<l_returnflag:string,p25:double,p50:double,p75:double,p99:double,cnt:bigint>",
    "rel_outlier_mad" ->
      "struct<event_type:string,med:double,mad:double,n:bigint,n_outliers:bigint>",
    "rel_percentiles" ->
      "struct<event_type:string,p50:double,p90:double,cnt:bigint>",
    "rel_qsketch_store" ->
      "struct<event_type:string,lvl:bigint,n_kept:bigint,p50_cents:bigint,p95_cents:bigint,contents:string>",
    "rel_kcore" ->
      "struct<k:bigint,vertex:bigint,core_deg:bigint>",
    "rel_coreness" ->
      "struct<vertex:bigint,coreness:bigint>",
    "rel_ktruss" ->
      "struct<k:bigint,a:bigint,b:bigint,support:bigint>",
    "rel_sketch_roundtrip" ->
      "struct<event_type:string,n_kept:bigint,est:double>",
    "rel_kmv_cap_curve" ->
      "struct<cap:bigint,n_kept:bigint,est:double,exact:bigint,rel_err:double>",
    "rel_winsorized_stats" ->
      "struct<l_returnflag:string,lo:double,hi:double,n:bigint,n_clip_lo:bigint,n_clip_hi:bigint,w_avg:double>",
    "src_manifest_prune" ->
      "struct<o_orderpriority:string,n:bigint,tot:double>",
    "src_time_travel" ->
      "struct<version:bigint,o_orderstatus:string,n:bigint,tot:double>",
    "src_time_travel_diff" ->
      "struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>",
    "src_txn_vacuum" ->
      "struct<o_orderstatus:string,n:bigint,tot:double>",
    "src_txn_skipping" ->
      "struct<o_orderpriority:string,n:bigint,tot:double>",
    "src_txn_concurrent" ->
      "struct<o_orderstatus:string,n:bigint,tot:double>",
    "src_txn_merge" ->
      "struct<o_orderstatus:string,n:bigint,tot:double>",
    "src_txn_cdf" ->
      "struct<key:bigint,change:string>",
    "src_txn_gc" ->
      "struct<o_orderstatus:string,n:bigint,tot:double>",
    "src_txn_restore" ->
      "struct<o_orderstatus:string,n:bigint,tot:double>",
    "src_txn_clone" ->
      "struct<o_orderstatus:string,n:bigint,tot:double>",
    "dedup_txn_incremental_lsh" ->
      "struct<band_idx:bigint,band:string,bucket_size:bigint>",
    "src_zorder_prune" ->
      "struct<o_orderpriority:string,n:bigint,tot:double>",
    "stream_asof_bounded" ->
      "struct<event_id:bigint,user_id:bigint,last_view_us:bigint>",
    "stream_asof_enrich" ->
      "struct<event_id:bigint,user_id:bigint,last_view_us:bigint>",
    "stream_asof_multi" ->
      "struct<event_id:bigint,user_id:bigint,lookup_type:string,last_us:bigint>",
    "stream_bitmap_distinct" ->
      "struct<event_type:string,n_users:bigint>",
    "stream_txn_cdc_pipeline" ->
      "struct<event_type:string,n_events:bigint,sum_cents:bigint>",
    "stream_calibration_bins" ->
      "struct<bin:bigint,n:bigint,mean_score:double,pos_rate:double>",
    "stream_closed_sessions" ->
      "struct<user_id:bigint,start_us:bigint,end_us:bigint,n_events:bigint>",
    "stream_count_handoff" ->
      "struct<event_type:string,n_events:bigint,sum_cents:bigint>",
    "stream_count_handoff_eo" ->
      "struct<event_type:string,n_events:bigint,sum_cents:bigint>",
    "stream_covariance" ->
      "struct<i:bigint,j:bigint,cov:double>",
    "stream_dedup_against_corpus" ->
      "struct<doc_id:bigint,source:string>",
    "stream_dedup_keys" ->
      "struct<user_id:bigint,event_type:string>",
    "stream_funnel_touch" ->
      "struct<user_id:bigint,first_signup_us:bigint,first_view_us:bigint,first_purchase_us:bigint,steps_completed:bigint,n_events:bigint>",
    "stream_heavy_hitters" ->
      "struct<user_id:bigint,cnt:bigint>",
    "stream_hll_distinct" ->
      "struct<event_type:string,within_10pct:bigint>",
    "stream_join_attrib" ->
      "struct<user_id:bigint,p_ts_us:bigint,v_ts_us:bigint>",
    "stream_join_left_outer" ->
      "struct<user_id:bigint,v_ts_us:bigint,p_ts_us:bigint>",
    "stream_ohlc" ->
      "struct<bar:bigint,event_type:string,open:bigint,high:bigint,low:bigint,close:bigint,n:bigint>",
    "stream_psi_drift" ->
      "struct<event_type:string,n_buckets:bigint,psi:double>",
    "stream_qsketch" ->
      "struct<event_type:string,lvl:bigint,n_kept:bigint,p50_cents:bigint,p95_cents:bigint,contents:string>",
    "stream_qsketch_handoff" ->
      "struct<event_type:string,lvl:bigint,n_kept:bigint,p50_cents:bigint,p95_cents:bigint,contents:string>",
    "stream_quantile_sketch" ->
      "struct<event_type:string,n:bigint,p50_est:double,p95_est:double>",
    "stream_scd2_enrich" ->
      "struct<event_id:bigint,user_id:bigint,k_at_purchase:bigint,version:bigint>",
    "stream_session_counts" ->
      "struct<user_id:bigint,n_events:bigint>",
    "stream_sketch_handoff" ->
      "struct<event_type:string,n_kept:bigint,est:double,exact:bigint>",
    "stream_sliding_counts" ->
      "struct<win_start_us:bigint,event_type:string,cnt:bigint>",
    "stream_static_enrich" ->
      "struct<user_id:bigint,event_type:string,c_mktsegment:string>",
    "stream_theta_distinct" ->
      "struct<event_type:string,n_kept:bigint,est:double,exact:bigint>",
    "stream_theta_setops" ->
      "struct<n_union:bigint,est_union:double,s_inter:bigint,est_inter:double,s_diff:bigint,est_diff:double,exact_union:bigint,exact_inter:bigint,exact_diff:bigint>",
    "stream_topk_types" ->
      "struct<event_type:string,cnt:bigint>",
    "stream_txn_sink" ->
      "struct<event_type:string,n_events:bigint,sum_cents:bigint>",
    "stream_windowed_counts" ->
      "struct<win_start_us:bigint,event_type:string,cnt:bigint>",
    "stream_windowed_counts_file" ->
      "struct<win_start_us:bigint,event_type:string,cnt:bigint>",
    "stream_wordcount" ->
      "struct<word:string,cnt:bigint>",
    "text_bpe_merges" ->
      "struct<step:int,pair:string,cnt:bigint>",
  )
}
