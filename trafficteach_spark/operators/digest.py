"""Cross-engine parity digest (harness coverage extension).

The driver's correctness gate checks the first 50 registry keys. The
engine registers 80+ queries, so the long tail past position 50 would
otherwise carry only local (``tools/parity.py``) evidence. This module
registers ONE driver-checkable query — ``q80_parity_digest`` — that runs
every demoted oracle-backed query and reduces each result to a
one-row fingerprint computed identically in Spark and DuckDB:

  qkey   — the constituent query key
  n      — COUNT(*)
  fp_int — sum over integer columns of the raw values
  fp_num — sum over double columns of ROUND(x*1000) as exact integers
  fp_str — sum over string columns of character lengths
  fp_ts  — sum over timestamp columns of epoch MILLIseconds (micros
           would overflow the BIGINT sum at ~5k rows; see _fp_aggs)
           (+ date columns as days-since-epoch)
  fp_md5 — sum over rows of the top 36 bits of md5(canonical row string)

All fingerprints are integer sums, so they are order-independent and
exact (no FP accumulation ambiguity across engines); doubles enter only
through ROUND(x*1000) on values both engines computed identically (the
full per-row hash parity of every constituent is separately verified by
``tools/parity.py``, recorded per round in PARITY_LOCAL.md).

``fp_md5`` is the anti-cancellation column (round-4 verdict item 3): the
per-column sums could in principle agree while individual rows differ in
compensating ways; a sum of per-row md5-derived integers makes that
implausible (two differing row multisets collide with probability
~2^-36 per query, and the collision would have to happen in BOTH the
column sums and the hash sum simultaneously). 36 bits (9 hex chars)
rather than 60 keeps the BIGINT sum overflow-free to ~1e8 rows under
ANSI arithmetic (2^36 * 1e8 < 2^63).

The declared schema map below is asserted against the live Spark schemas
in tests/test_registry.py, so a constituent query changing shape fails
fast instead of silently fingerprinting the wrong columns.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafficteach_spark import registry
from trafficteach_spark.functions.exprs import epoch_us_sql

# key -> [(column, simpleString dtype)] for every demoted oracle-backed
# query (positions 51+ of the driver order; see registry.DRIVER_ORDER).
# Rotated each round in lockstep with DRIVER_ORDER: promoted keys leave
# this dict, demoted keys enter it with their live Spark schemas.
DIGEST_SCHEMAS: dict[str, list[tuple[str, str]]] = {
    # Round-13 regeneration (window rotation): the demoted set is
    # every oracle-backed key past position 50 of the r13
    # DRIVER_ORDER; entries are the live Spark schemas (asserted in
    # tests/test_registry.py). Prior rotations' entry-by-entry
    # history lives in git.
    "q01_filter_range": [("event_id", "bigint"), ("ts", "timestamp_ntz"), ("user_id", "bigint"), ("event_type", "string"), ("value", "double")],
    "q02_group_count": [("event_type", "string"), ("n_events", "bigint"), ("n_users", "bigint"), ("sum_value", "double"), ("avg_value", "double")],
    "q03_star_join": [("r_name", "string"), ("n_name", "string"), ("revenue", "double"), ("n_orders", "bigint")],
    "q04_monitor_state": [("n_name", "string"), ("n_suppliers", "bigint"), ("n_active", "bigint"), ("n_silent", "bigint")],
    "q05_missing_cameras": [("s_suppkey", "bigint"), ("s_name", "string")],
    "q06_topn": [("user_id", "bigint"), ("n_events", "bigint")],
    "q06_topn_details": [("event_id", "bigint"), ("ts", "timestamp_ntz"), ("user_id", "bigint"), ("event_type", "string"), ("value", "double")],
    "q07_speed_buckets": [("event_type", "string"), ("n_high", "bigint"), ("n_medium", "bigint"), ("n_normal", "bigint"), ("n_low", "bigint")],
    "q08_stratified_sample": [("stratum_hour", "timestamp"), ("event_id", "bigint"), ("user_id", "bigint"), ("event_type", "string"), ("value", "double")],
    "q09_group_concat": [("event_type", "string"), ("users", "string"), ("n_users", "bigint")],
    "q11_topk_per_group": [("event_type", "string"), ("user_id", "bigint"), ("n_events", "bigint"), ("rn", "int")],
    "q12_trajectory": [("user_id", "bigint"), ("trajectory", "string"), ("n_hops", "bigint"), ("first_ts", "timestamp_ntz"), ("last_ts", "timestamp_ntz")],
    "q13_follow_within": [("leader_id", "bigint"), ("follower_id", "bigint"), ("n_follow", "bigint")],
    "q15_union": [("event_id", "bigint"), ("ts", "timestamp_ntz"), ("user_id", "bigint"), ("event_type", "string"), ("value", "double")],
    "q17_date_funcs": [("event_date", "date"), ("hr", "int"), ("day_name", "string"), ("n_events", "bigint"), ("n_users", "bigint")],
    "q18_json_funcs": [("event_type", "string"), ("n_events", "bigint"), ("max_k", "bigint"), ("sum_k", "bigint"), ("avg_k", "double"), ("n_high", "bigint")],
    "q19_funnel": [("step", "int"), ("step_type", "string"), ("n_users", "bigint"), ("rate", "double")],
    "q20_sliding_window": [("window_start", "timestamp_ntz"), ("window_end", "timestamp_ntz"), ("event_type", "string"), ("n_events", "bigint"), ("sum_value", "double"), ("avg_value", "double")],
    "q21_tumbling_window": [("window_start", "timestamp_ntz"), ("window_end", "timestamp_ntz"), ("event_type", "string"), ("n_events", "bigint"), ("sum_value", "double")],
    "q22_session_window": [("user_id", "bigint"), ("session_start", "timestamp_ntz"), ("session_end", "timestamp_ntz"), ("n_events", "bigint")],
    "q23_pandas_udaf": [("event_type", "string"), ("value_spread", "double")],
    "q23_pandas_udf": [("event_type", "string"), ("speed_decile", "bigint"), ("n_events", "bigint")],
    "q24_explode": [("label", "int"), ("pos", "int"), ("n_vals", "bigint"), ("min_val", "double"), ("max_val", "double"), ("avg_val", "double")],
    "q30_exact_dedup": [("content_hash", "string"), ("doc_id", "bigint"), ("n_copies", "bigint")],
    "q31_minhash_lsh": [("doc_a", "bigint"), ("doc_b", "bigint"), ("jaccard", "double")],
    "q31_near_dedup": [("doc_a", "bigint"), ("doc_b", "bigint"), ("jaccard", "double")],
    "q31_simhash_md5": [("doc_a", "bigint"), ("doc_b", "bigint"), ("hamming", "int")],
    "q32_knn_cosine": [("qid", "bigint"), ("nid", "bigint"), ("cosine", "double"), ("knn_rank", "int")],
    "q32_knn_ivf": [("qid", "bigint"), ("nid", "bigint"), ("cosine", "double"), ("knn_rank", "int")],
    "q32_knn_lsh": [("qid", "bigint"), ("nid", "bigint"), ("cosine", "double"), ("knn_rank", "int")],
    "q33_text_stats": [("lang", "string"), ("source", "string"), ("n_docs", "bigint"), ("sum_tokens", "bigint"), ("avg_tokens", "double"), ("avg_chars", "double"), ("min_chars", "bigint"), ("max_chars", "bigint")],
    "q34_multimodal_join": [("label", "int"), ("lang", "string"), ("n_docs", "bigint"), ("sum_chars", "bigint"), ("avg_chars", "double"), ("min_doc_id", "bigint")],
    "q35_embed_near_dup": [("vec_a", "bigint"), ("vec_b", "bigint"), ("cosine", "double")],
    "q36_langid": [("actual_lang", "string"), ("predicted_lang", "string"), ("n_docs", "bigint")],
    "q37_token_count": [("lang", "string"), ("n_docs", "bigint"), ("ws_tokens", "bigint"), ("alpha_tokens", "bigint"), ("num_tokens", "bigint"), ("punct_tokens", "bigint")],
    "q38_fingerprint": [("doc_id", "bigint"), ("fingerprint", "string"), ("n_uniq_tokens", "int")],
    "q39_quality_score": [("doc_id", "bigint"), ("n_tokens", "int"), ("uniq_ratio", "double"), ("avg_token_len", "double"), ("stop_ratio", "double"), ("quality", "string")],
    "q40_binary_pipeline": [("doc_id", "bigint"), ("width", "bigint"), ("payload_len", "bigint"), ("payload_md5", "string")],
    "q41_frame_sample": [("doc_id", "bigint"), ("frame_idx", "bigint"), ("n_frames", "bigint"), ("frame_md5", "string")],
    "q42_resize": [("doc_id", "bigint"), ("orig_len", "bigint"), ("thumb", "string"), ("thumb_md5", "string")],
    "q43_chunk_split": [("doc_id", "bigint"), ("chunk_idx", "bigint"), ("chunk_text", "string"), ("n_tokens", "bigint")],
    "q44_int8_quantize": [("vec_id", "bigint"), ("label", "int"), ("scale", "double"), ("qv", "string"), ("max_abs_err", "double")],
    "q45_repetition": [("doc_id", "bigint"), ("n_grams", "bigint"), ("n_dup_grams", "bigint"), ("dup_ratio", "double"), ("is_repetitive", "int")],
    "q46_dedup_clusters": [("doc_id", "bigint"), ("canonical_id", "bigint"), ("is_canonical", "int")],
    "q47_pii_redact": [("doc_id", "bigint"), ("n_emails", "int"), ("n_phones", "int"), ("redacted", "string")],
    "q48_tfidf": [("doc_id", "bigint"), ("term", "string"), ("tf", "bigint"), ("df", "bigint"), ("tfidf", "double"), ("term_rank", "int")],
    "q49_pack_sequences": [("doc_id", "bigint"), ("source", "string"), ("n_tokens", "bigint"), ("bin_id", "bigint"), ("pack_offset", "bigint")],
    "q50_decontaminate": [("doc_id", "bigint"), ("n_shared_grams", "bigint")],
    "q51_asof_join": [("event_id", "bigint"), ("user_id", "bigint"), ("ts", "timestamp_ntz"), ("o_orderkey", "bigint"), ("o_orderdate", "timestamp_ntz")],
    "q52_percentiles": [("event_type", "string"), ("n", "bigint"), ("p50", "double"), ("p90", "double"), ("p99", "double")],
    "q53_rollup": [("event_type", "string"), ("hr", "int"), ("gid", "bigint"), ("n", "bigint"), ("sum_value", "double")],
    "q54_pivot": [("hr", "int"), ("n_click", "bigint"), ("n_error", "bigint"), ("n_purchase", "bigint"), ("n_signup", "bigint"), ("n_view", "bigint")],
    "q55_salted_distinct": [("event_type", "string"), ("n_distinct", "bigint")],
    "q56_vocab_topk": [("term", "string"), ("n", "bigint"), ("frac", "double"), ("vocab_rank", "int")],
    "q57_edit_distance": [("doc_a", "bigint"), ("doc_b", "bigint"), ("edit_dist", "int")],
    "q58_domain_mix": [("doc_id", "bigint"), ("source", "string"), ("sample_rank", "int")],
    "q59_label_centroids": [("label", "int"), ("n_vectors", "bigint"), ("centroid", "string")],
    "q60_histogram": [("event_type", "string"), ("bin_id", "int"), ("n", "bigint"), ("lo_seen", "double"), ("hi_seen", "double")],
    "q61_merge_upsert": [("o_orderkey", "bigint"), ("o_custkey", "bigint"), ("o_orderstatus", "string")],
    "q62_time_resample": [("event_type", "string"), ("hr", "timestamp"), ("n", "bigint"), ("sum_value", "double")],
    "q63_range_join": [("o_orderpriority", "string"), ("n_pairs", "bigint"), ("n_orders", "bigint"), ("sum_qty", "double")],
    "q64_cumulative": [("o_custkey", "bigint"), ("o_orderkey", "bigint"), ("seq", "bigint"), ("running_total", "double"), ("mov_avg3", "double")],
    "q65_cube": [("o_orderstatus", "string"), ("o_orderpriority", "string"), ("gid", "bigint"), ("n", "bigint"), ("sum_price", "double")],
    "q66_anomaly": [("event_type", "string"), ("hr", "timestamp"), ("n", "bigint"), ("z", "double")],
    "q67_basket_pairs": [("part_a", "bigint"), ("part_b", "bigint"), ("n_orders", "bigint")],
    "q68_attribution_join": [("user_id", "bigint"), ("view_id", "bigint"), ("view_ts", "timestamp_ntz"), ("purchase_id", "bigint"), ("purchase_ts", "timestamp_ntz"), ("purchase_value", "double")],
    "q69_unpivot": [("hr", "int"), ("event_type", "string"), ("n", "bigint")],
    "q70_trailing_range": [("o_custkey", "bigint"), ("o_orderkey", "bigint"), ("o_orderdate", "timestamp_ntz"), ("trailing_30d", "double"), ("n_30d", "bigint")],
    "q71_full_outer": [("d", "date"), ("n_orders", "bigint"), ("n_ships", "bigint"), ("presence", "string")],
    "q72_corr_stats": [("l_returnflag", "string"), ("n", "bigint"), ("qty_price_corr", "double"), ("qty_disc_covar", "double"), ("price_stddev", "double")],
    "q73_regex_extract": [("token", "string"), ("n", "bigint"), ("n_docs", "bigint")],
    "q74_rank_distribution": [("event_id", "bigint"), ("event_type", "string"), ("quartile", "int"), ("pct_rank", "double"), ("cume", "double")],
    "q75_bm25": [("doc_id", "bigint"), ("score", "double")],
    "q76_set_ops_bag": [("o_custkey", "bigint"), ("kind", "string"), ("n", "bigint")],
    "q78_id_gaps": [("event_type", "string"), ("gap_start", "bigint"), ("gap_end", "bigint"), ("n_missing", "bigint")],
    "q79_weighted_sample": [("o_orderkey", "bigint"), ("o_totalprice", "double"), ("o_orderpriority", "string")],
    "q81_hash_split": [("doc_id", "bigint"), ("split", "string"), ("n_chars", "bigint")],
    "q82_bpe_pairs": [("pair", "string"), ("n", "bigint")],
    "q83_feature_bins_exact": [("l_returnflag", "string"), ("decile", "int"), ("n", "bigint"), ("lo", "double"), ("hi", "double"), ("avg_price", "double")],
    "q85_window_dedup": [("event_id", "bigint"), ("user_id", "bigint"), ("event_type", "string"), ("ts", "timestamp_ntz")],
    "q86_feature_normalize": [("l_orderkey", "bigint"), ("l_linenumber", "int"), ("l_returnflag", "string"), ("minmax", "double"), ("zscore", "double")],
    "q87_bigram_pmi": [("bigram", "string"), ("n", "bigint"), ("pmi", "double")],
    "q88_keep_best_per_cluster": [("canonical_id", "bigint"), ("best_doc_id", "bigint"), ("cluster_size", "bigint"), ("best_quality", "string"), ("best_n_tokens", "int")],
    "q89_asof_forward": [("o_orderkey", "bigint"), ("user_id", "bigint"), ("o_orderdate", "timestamp_ntz"), ("event_id", "bigint"), ("event_ts", "timestamp_ntz")],
    "q90_containment_dedup": [("doc_a", "bigint"), ("doc_b", "bigint"), ("containment", "double")],
    "q91_corpus_pipeline": [("lang", "string"), ("source", "string"), ("n_docs", "bigint"), ("n_kept", "bigint"), ("kept_tokens", "bigint")],
    "q92_ewma": [("user_id", "bigint"), ("event_id", "bigint"), ("ts", "timestamp_ntz"), ("value", "double"), ("ewma", "double")],
    "q93_unigram_logprob": [("doc_id", "bigint"), ("n_tokens", "bigint"), ("avg_logprob", "double")],
    "q94_token_entropy": [("doc_id", "bigint"), ("n_tokens", "bigint"), ("n_distinct", "bigint"), ("entropy", "double")],
    "q95_zipf_slope": [("n_terms", "bigint"), ("zipf_slope", "double"), ("zipf_r2", "double")],
    "q96_psi_drift": [("event_type", "string"), ("n_first", "bigint"), ("n_second", "bigint"), ("n_bins", "bigint"), ("psi", "double")],
    "q98_source_overlap": [("src_a", "string"), ("src_b", "string"), ("n_common", "bigint"), ("n_a", "bigint"), ("n_b", "bigint"), ("jaccard", "double")],
    "q99_dup_rate_by_source": [("source", "string"), ("n_docs", "bigint"), ("n_dupes", "bigint"), ("n_clusters", "bigint"), ("dup_rate", "double")],
    "q100_scd2_history": [("user_id", "bigint"), ("version", "bigint"), ("event_type", "string"), ("valid_from", "timestamp_ntz"), ("valid_to", "timestamp_ntz"), ("n_events", "bigint")],
    "q101_incremental_rollup": [("event_type", "string"), ("day", "date"), ("n", "bigint"), ("sum_value", "double"), ("min_value", "double"), ("max_value", "double"), ("avg_value", "double")],
    "q102_heavy_hitters": [("user_id", "bigint"), ("freq", "bigint"), ("share", "double")],
    "q103_corr_matrix": [("col_a", "string"), ("col_b", "string"), ("n", "bigint"), ("corr", "double")],
    "q104_fk_audit": [("child_table", "string"), ("fk_col", "string"), ("parent_table", "string"), ("n_child", "bigint"), ("n_orphan", "bigint"), ("orphan_rate", "double")],
    "q105_cohort_retention": [("cohort_wk", "date"), ("week_offset", "bigint"), ("n_active", "bigint"), ("cohort_size", "bigint"), ("retention", "double")],
    "q107_rolling_active_users": [("day", "date"), ("dau", "bigint"), ("wau", "bigint"), ("stickiness", "double")],
    "q108_time_to_convert": [("n_converted", "bigint"), ("n_signups", "bigint"), ("conversion_rate", "double"), ("min_sec", "double"), ("p50_sec", "double"), ("p90_sec", "double"), ("max_sec", "double")],
    "q109_transition_matrix": [("src", "string"), ("dst", "string"), ("n", "bigint"), ("p", "double")],
    "q110_ab_lift": [("n_a", "bigint"), ("conv_a", "bigint"), ("rate_a", "double"), ("n_b", "bigint"), ("conv_b", "bigint"), ("rate_b", "double"), ("lift", "double"), ("z", "double")],
    "q111_fulfillment_lag": [("o_orderpriority", "string"), ("n_orders", "bigint"), ("avg_days", "double"), ("p50_days", "double"), ("p90_days", "double")],
    "q112_incremental_dedup": [("doc_id", "bigint"), ("n_dups", "bigint"), ("best_jaccard", "double"), ("is_new", "int")],
    "q113_linear_attribution": [("user_id", "bigint"), ("view_id", "bigint"), ("n_purchases", "bigint"), ("credit", "double")],
    "q114_snapshot_diff": [("kind", "string"), ("n_rows", "bigint")],
    "q116_gap_fill_locf": [("event_type", "string"), ("hr", "timestamp"), ("n", "bigint"), ("avg_value", "double"), ("locf_avg", "double"), ("is_gap", "int")],
    "q117_feature_hashing": [("doc_id", "bigint"), ("bucket", "int"), ("n", "bigint")],
    "q118_chunk_dedup": [("doc_id", "bigint"), ("n_chunks", "bigint"), ("n_dup_chunks", "bigint"), ("dup_frac", "double")],
    "q119_python_udtf": [("doc_id", "bigint"), ("start_pos", "int"), ("token", "string"), ("run_len", "int")],
    "q120_skew_audit": [("child_table", "string"), ("key_col", "string"), ("n_rows", "bigint"), ("n_keys", "bigint"), ("max_per_key", "bigint"), ("p99_per_key", "double"), ("top_share", "double")],
    "q121_session_paths": [("path", "string"), ("n", "bigint")],
    "q122_pit_join": [("l_orderkey", "bigint"), ("l_linenumber", "int"), ("l_shipdate", "timestamp_ntz"), ("ck", "bigint"), ("version", "bigint"), ("status_at_ship", "string")],
    "q123_code_detect": [("doc_id", "bigint"), ("n_tokens", "int"), ("kw_ratio", "double"), ("sym_ratio", "double"), ("is_code", "int")],
    "q124_mad_outliers": [("event_type", "string"), ("n_events", "bigint"), ("median_value", "double"), ("mad", "double"), ("n_outliers", "bigint"), ("outlier_rate", "double")],
    "q125_lsh_recall_eval": [("n_truth", "bigint"), ("n_cand", "bigint"), ("n_hits", "bigint"), ("recall", "double"), ("precision", "double")],
    "q126_bigram_lm_logprob": [("doc_id", "bigint"), ("n_bigrams", "bigint"), ("avg_logprob", "double")],
    "q127_changepoint": [("event_type", "string"), ("cp_day", "date"), ("n_days", "bigint"), ("mean_daily", "double"), ("cusum_dev", "double")],
    "q128_seasonal_decompose": [("event_type", "string"), ("dow", "int"), ("n_days", "bigint"), ("avg_count", "double"), ("seasonal_index", "double")],
    "q129_window_funnel": [("step", "int"), ("step_type", "string"), ("n_users", "bigint"), ("rate", "double")],
    "q130_ngram_novelty": [("doc_id", "bigint"), ("n_grams", "bigint"), ("n_novel", "bigint"), ("novelty", "double")],
    "q131_embedding_margin": [("label", "int"), ("n_vectors", "bigint"), ("avg_margin", "double"), ("n_misassigned", "bigint"), ("misassign_rate", "double")],
    "q132_user_lifecycle": [("wk", "date"), ("n_new", "bigint"), ("n_retained", "bigint"), ("n_resurrected", "bigint"), ("n_churned", "bigint")],
    "q133_boilerplate_chunks": [("h", "string"), ("chunk_text", "string"), ("n_docs", "bigint"), ("n_occ", "bigint"), ("n_sources", "bigint")],
    "q134_dedup_impact": [("source", "string"), ("n_docs", "bigint"), ("n_kept", "bigint"), ("tokens_total", "bigint"), ("tokens_kept", "bigint"), ("pct_tokens_dropped", "double")],
    "q135_time_weighted_avg": [("event_type", "string"), ("n_segments", "bigint"), ("span_sec", "double"), ("twa_value", "double"), ("plain_avg", "double")],
    "q137_cms_topk": [("user_id", "bigint"), ("freq", "bigint"), ("cms_est", "bigint"), ("overestimate", "bigint")],
    "q138_srm_check": [("n_a", "bigint"), ("n_b", "bigint"), ("chi2", "double"), ("srm", "int")],
    "q139_ols_regression": [("n", "bigint"), ("beta0", "double"), ("beta1", "double"), ("beta2", "double"), ("r2", "double")],
    "q140_rfm_segmentation": [("r_q", "int"), ("f_q", "int"), ("m_q", "int"), ("n_customers", "bigint"), ("sum_monetary", "double")],
    "q143_benford_check": [("digit", "int"), ("n", "bigint"), ("obs_share", "double"), ("exp_share", "double"), ("deviation", "double")],
    "q144_cuped_lift": [("n_a", "bigint"), ("n_b", "bigint"), ("theta", "double"), ("lift_raw", "double"), ("lift_cuped", "double"), ("var_reduction", "double")],
    "q145_spearman_corr": [("n", "bigint"), ("n_qty_values", "bigint"), ("n_disc_values", "bigint"), ("spearman_rho", "double")],
    "q146_degree_distribution": [("degree", "bigint"), ("n_parts", "bigint"), ("share", "double")],
    "q147_activity_bitmap": [("n_active_days", "int"), ("n_users", "bigint"), ("n_streak3", "bigint")],
    "q148_decile_lift": [("decile", "int"), ("n_customers", "bigint"), ("n_urgent", "bigint"), ("urgent_rate", "double"), ("lift", "double"), ("cum_capture", "double")],
    "q149_wilson_ctr": [("event_type", "string"), ("n", "bigint"), ("s", "bigint"), ("p_hat", "double"), ("wilson_lo", "double"), ("wilson_hi", "double")],
    "q150_higher_moments": [("l_returnflag", "string"), ("n", "bigint"), ("mean_price", "double"), ("pop_stddev", "double"), ("skewness", "double"), ("ex_kurtosis", "double")],
    "q187_raking_weights": [("source", "string"), ("lang", "string"), ("n_docs", "bigint"), ("weight", "double")],
    "q188_hash_collision_audit": [("width", "int"), ("n_terms", "bigint"), ("n_buckets_used", "bigint"), ("collided_buckets", "bigint"), ("collision_mass_share", "double")],
    "q191_winsorized_stats": [("n_users", "bigint"), ("mean_raw", "double"), ("std_raw", "double"), ("mean_winsor", "double"), ("std_winsor", "double"), ("mean_trim", "double"), ("n_trim", "bigint")],
    "q192_poisson_bootstrap": [("n_users", "bigint"), ("n_replicas", "int"), ("mean_raw", "double"), ("boot_se", "double")],
    "q193_join_cardinality_audit": [("n_keys", "bigint"), ("total_rows", "bigint"), ("total_pairs", "bigint"), ("max_key_pairs", "bigint"), ("top1_share", "double"), ("skew_ratio", "double")],
    "q194_forecast_baselines": [("n_days", "bigint"), ("mae_naive", "double"), ("mae_snaive", "double"), ("mape_naive", "double"), ("mape_snaive", "double"), ("snaive_vs_naive", "double")],
    "q195_did_lift": [("n_obs", "bigint"), ("treat_pre", "double"), ("treat_post", "double"), ("ctrl_pre", "double"), ("ctrl_post", "double"), ("did", "double"), ("se", "double"), ("z", "double")],
    "q196_auc_score": [("n_pos", "bigint"), ("n_neg", "bigint"), ("auc", "double"), ("gini", "double")],
    "q197_calibration_bins": [("bin", "int"), ("n_users", "bigint"), ("avg_score", "double"), ("conv_rate", "double")],
    "q199_variance_reduction_report": [("n_users", "bigint"), ("theta", "double"), ("se_raw", "double"), ("se_cuped", "double"), ("se_winsor", "double"), ("vr_cuped", "double"), ("vr_winsor", "double")],
    "q200_discount_elasticity": [("brand", "string"), ("n_items", "bigint"), ("elasticity", "double"), ("r2", "double")],
    "q201_asof_snapshot": [("user_id", "bigint"), ("version", "bigint"), ("event_type", "string"), ("valid_from", "timestamp_ntz"), ("n_events", "bigint")],
    "q202_dedup_method_agreement": [("n_docs", "bigint"), ("n_lexical_dropped", "bigint"), ("n_semantic_dropped", "bigint"), ("n_both", "bigint"), ("jaccard", "double"), ("pct_agree", "double")],
    "q203_sample_representativeness": [("event_type", "string"), ("n_pop", "bigint"), ("n_sample", "bigint"), ("sampling_frac", "double"), ("mean_pop", "double"), ("mean_sample", "double"), ("z", "double")],
    "q204_attribution_outer": [("user_id", "bigint"), ("view_id", "bigint"), ("view_ts", "timestamp_ntz"), ("purchase_id", "bigint"), ("purchase_ts", "timestamp_ntz"), ("purchase_value", "double")],
    "q205_stream_enrich": [("event_id", "bigint"), ("user_id", "bigint"), ("user_name", "string"), ("nationkey", "int"), ("event_type", "string"), ("value", "double")],
    "q206_sparse_cosine": [("doc_a", "bigint"), ("doc_b", "bigint"), ("cosine", "double")],
    "q208_position_attribution": [("user_id", "bigint"), ("view_id", "bigint"), ("n_purchases", "bigint"), ("credit", "double")],
    "q209_cvm_drift": [("event_type", "string"), ("n_first", "bigint"), ("n_second", "bigint"), ("cvm_stat", "double"), ("drift_flag", "int")],
    "q210_info_gain": [("feature", "string"), ("n_rows", "bigint"), ("n_bins", "bigint"), ("h_label", "double"), ("h_cond", "double"), ("info_gain", "double")],
    "q211_tokenizer_coverage": [("source", "string"), ("n_tokens", "bigint"), ("n_covered", "bigint"), ("coverage", "double"), ("n_oov_types", "bigint")],
    "q212_bradley_terry": [("event_type", "string"), ("n_wins", "bigint"), ("n_contests", "bigint"), ("strength", "double")],
    "q213_filter_agreement": [("n_docs", "bigint"), ("n_gopher_pass", "bigint"), ("n_quality_pass", "bigint"), ("n_both_pass", "bigint"), ("po", "double"), ("pe", "double"), ("kappa", "double")],
    "q214_kendall_tau": [("n_groups", "bigint"), ("n_pairs", "bigint"), ("concordant", "bigint"), ("discordant", "bigint"), ("ties_x", "bigint"), ("ties_y", "bigint"), ("tau_b", "double")],
    "q215_kruskal_wallis": [("n_groups", "bigint"), ("n_total", "bigint"), ("h", "double"), ("h_adj", "double")],
    "q216_user_state_batch": [("user_id", "bigint"), ("n_events", "bigint"), ("sum_value", "double"), ("last_ts", "timestamp_ntz"), ("last_event_type", "string")],
    "q217_average_precision": [("n_pos", "bigint"), ("n_neg", "bigint"), ("prevalence", "double"), ("average_precision", "double")],
    "q218_xcorr_lag": [("lag", "int"), ("n_days", "bigint"), ("r", "double")],
    "q219_hard_negatives": [("vec_id", "bigint"), ("label", "int"), ("hard_neg_id", "bigint"), ("hard_neg_label", "int"), ("hard_neg_cos", "double")],
    "q_stream_avg": [("event_type", "string"), ("n_events", "bigint"), ("avg_speed", "double")],
}
_INT_TYPES = {"bigint", "int", "smallint", "tinyint"}

# 36-bit md5 prefix (9 hex chars): sum stays inside BIGINT to ~1e8 rows.
_MD5_HEX_CHARS = 9


def _md5_int_expr(s: str, engine: str) -> str:
    """Top {_MD5_HEX_CHARS} hex chars of md5(``s``) as a BIGINT, identically
    in both engines. Spark parses the hex prefix directly; DuckDB's
    ``md5_number_upper`` returns the first 8 digest bytes LITTLE-endian,
    so the bytes are swapped back to hex-string order (HUGEINT arithmetic
    — same proven trick as llm/dedup._DUCK_MD5_TOKEN_HASH) and the low
    {_MD5_DROP_BITS} bits dropped."""
    from trafficteach_spark.functions.exprs import (
        md5_prefix_int_duck,
        md5_prefix_int_spark,
    )

    if engine == "spark":
        return md5_prefix_int_spark(s, _MD5_HEX_CHARS)
    return md5_prefix_int_duck(s, _MD5_HEX_CHARS)


def _canon_token(c: str, dtype: str, spark: bool) -> str:
    """Canonical STRING rendering of one column for the fp_md5 row string
    — every branch renders to the identical text in both engines (ints
    and the ROUND(x*1000) integers print alike; timestamps/dates go
    through their epoch integers, never engine-specific formatting).
    NULL renders as an unprintable sentinel no fixture string contains."""
    null_tok = "CHAR(2)" if spark else "CHR(2)"
    to_str = "STRING" if spark else "VARCHAR"
    if dtype in _INT_TYPES:
        val = f"CAST({c} AS {to_str})"
    elif dtype == "boolean":
        # Render as 0/1, not engine-specific true/True text.
        val = f"CASE WHEN {c} THEN '1' ELSE '0' END"
    elif dtype in ("double", "float"):
        rounded = (
            f"CAST(ROUND({c} * 1000, 0) AS BIGINT)"
            if spark
            else f"CAST(ROUND({c} * 1000) AS BIGINT)"
        )
        return (
            f"CASE WHEN {c} IS NULL THEN {null_tok}"
            f" WHEN isnan({c}) THEN 'NaN'"
            f" ELSE CAST({rounded} AS {to_str}) END"
        )
    elif dtype == "string":
        val = c
    elif dtype in ("timestamp", "timestamp_ntz"):
        # tz-FREE millis (epoch_us_sql div 1000), not
        # unix_millis(CAST(..AS TIMESTAMP)): the NTZ->LTZ cast shifts by
        # the session zone if the pinned-UTC conf is ever refused — the
        # exact hazard epoch_us_sql was built to remove (round-10 review
        # finding); identical values under UTC, oracle-matching always.
        val = (
            f"CAST(({epoch_us_sql(c)}) div 1000 AS {to_str})"
            if spark
            else f"CAST(epoch_ms({c}) AS {to_str})"
        )
    elif dtype == "date":
        val = (
            f"CAST(datediff({c}, DATE'1970-01-01') AS {to_str})"
            if spark
            else f"CAST({c} - DATE '1970-01-01' AS {to_str})"
        )
    else:  # pragma: no cover - new dtype must be handled explicitly
        raise ValueError(f"unhandled canon dtype {dtype!r}")
    return f"CASE WHEN {c} IS NULL THEN {null_tok} ELSE {val} END"


def _terms(cols: list[tuple[str, str]], engine: str) -> dict[str, list[str]]:
    """Per-fingerprint per-row term expressions for one engine.

    Every term is an exact BIGINT, so the enclosing SUM is
    order-independent and identical across engines.
    """
    spark = engine == "spark"
    q = (lambda c: f"`{c}`") if spark else (lambda c: f'"{c}"')
    out: dict[str, list[str]] = {"fp_int": [], "fp_num": [], "fp_str": [], "fp_ts": []}
    sep = "CHAR(1)" if spark else "CHR(1)"
    row_str = (
        f"CONCAT_WS({sep}, "
        + ", ".join(_canon_token(q(n), d, spark) for n, d in cols)
        + ")"
    )
    out["fp_md5"] = [_md5_int_expr(row_str, engine)]
    for name, dtype in cols:
        c = q(name)
        if dtype in _INT_TYPES:
            out["fp_int"].append(f"CAST(COALESCE({c}, 0) AS BIGINT)")
        elif dtype == "boolean":
            out["fp_int"].append(
                f"CAST(COALESCE(CASE WHEN {c} THEN 1 ELSE 0 END, 0) AS BIGINT)"
            )
        elif dtype in ("double", "float"):
            # ROUND first (integral double), CAST second: DuckDB's
            # double->bigint cast rounds while Spark's truncates, so the
            # cast must only ever see an already-integral value.
            if spark:
                out["fp_num"].append(
                    f"CASE WHEN {c} IS NULL OR isnan({c}) THEN CAST(0 AS BIGINT)"
                    f" ELSE CAST(ROUND({c} * 1000, 0) AS BIGINT) END"
                )
            else:
                out["fp_num"].append(
                    f"CASE WHEN {c} IS NULL OR isnan({c}) THEN 0"
                    f" ELSE CAST(ROUND({c} * 1000) AS BIGINT) END"
                )
        elif dtype == "string":
            out["fp_str"].append(f"CAST(LENGTH(COALESCE({c}, '')) AS BIGINT)")
        elif dtype in ("timestamp", "timestamp_ntz"):
            # Millis, not micros: an epoch-micros SUM overflows BIGINT at
            # ~5k rows (1.7e15 each); millis keeps >100x headroom at sf0.1.
            if spark:
                # tz-free like the canonical token above
                out["fp_ts"].append(
                    f"COALESCE(({epoch_us_sql(c)}) div 1000, 0)"
                )
            else:
                out["fp_ts"].append(f"COALESCE(epoch_ms({c}), 0)")
        elif dtype == "date":
            if spark:
                out["fp_ts"].append(
                    f"CAST(COALESCE(datediff({c}, DATE'1970-01-01'), 0) AS BIGINT)"
                )
            else:
                out["fp_ts"].append(
                    f"CAST(COALESCE({c} - DATE '1970-01-01', 0) AS BIGINT)"
                )
        else:  # pragma: no cover - new dtype must be handled explicitly
            raise ValueError(f"unhandled digest dtype {dtype!r} for {name!r}")
    return out


def _fp_aggs(cols: list[tuple[str, str]], engine: str) -> list[tuple[str, str]]:
    """(aggregate expression, alias) pairs for the five fingerprints
    (fp_int, fp_num, fp_str, fp_ts, fp_md5)."""
    terms = _terms(cols, engine)
    out = []
    for fp in ("fp_int", "fp_num", "fp_str", "fp_ts", "fp_md5"):
        row = " + ".join(terms[fp]) if terms[fp] else "CAST(0 AS BIGINT)"
        out.append((f"CAST(COALESCE(SUM({row}), 0) AS BIGINT)", fp))
    return out


def digest_keys() -> list[str]:
    return list(DIGEST_SCHEMAS)


def build_oracle() -> str:
    subs = []
    covered = set()
    for key, spec in registry.peek_specs().items():
        if key not in DIGEST_SCHEMAS or spec.oracle is None:
            continue
        # A constituent may itself use the lazy-callable oracle form, and
        # whether registry._load() has resolved it before THIS builder runs
        # depends on dict insertion order — resolve here so a callable is
        # never f-string-embedded as a function repr into the composed SQL.
        oracle_sql = spec.oracle() if callable(spec.oracle) else spec.oracle
        fps = ", ".join(
            f"{expr} AS {alias}" for expr, alias in _fp_aggs(DIGEST_SCHEMAS[key], "duckdb")
        )
        subs.append(
            f"SELECT '{key}' AS qkey, COUNT(*) AS n, {fps}\n"
            f"FROM (\n{oracle_sql}\n) __digest_{key}"
        )
        covered.add(key)
    if covered != set(DIGEST_SCHEMAS):
        # Not an assert: under ``python -O`` a silently shrunken oracle
        # would surface as a baffling parity diff instead of this error.
        raise RuntimeError(
            "digest keys missing an oracle/spec: "
            f"{sorted(set(DIGEST_SCHEMAS) - covered)}"
        )
    return "\nUNION ALL\n".join(subs)


@registry.register("q80_parity_digest", oracle=build_oracle, tags=("harness", "digest"))
def parity_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One fingerprint row per demoted query — the driver-facing rollup
    that keeps the 50-key correctness gate covering the whole registry.

    A global (group-less) aggregate per constituent so an empty result
    still yields its one n=0 row, exactly like the oracle's COUNT(*).
    """
    specs = registry.peek_specs()
    frames = []
    for key in DIGEST_SCHEMAS:
        df = specs[key].fn(spark, sf_dir)
        aggs = [F.count(F.lit(1)).cast("long").alias("n")] + [
            F.expr(expr).alias(alias)
            for expr, alias in _fp_aggs(DIGEST_SCHEMAS[key], "spark")
        ]
        frames.append(df.agg(*aggs).select(F.lit(key).alias("qkey"), "*"))
    return reduce(DataFrame.unionByName, frames)
