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
    # Round-6 demotions: full-hash green in round 5 (CORRECTNESS_r05)
    # Round-8 demotions: doubly evidenced (full-hash green in r6 AND r7),
    # plus the r7-evidenced q112+ block demoted one-for-one as round-8
    # additions landed (q115 is rows-only — no oracle, so no digest row;
    # its invariant tests in tests/ remain its evidence).
    "q96_psi_drift": [("event_type", "string"), ("n_first", "bigint"), ("n_second", "bigint"), ("n_bins", "bigint"), ("psi", "double")],
    # Late round-8 demotions: singly evidenced r7, displaced one-for-one
    # by the q169-q173 batch (the zero-evidence keys outrank them for
    # window slots; these stay hash-pinned here + in the local sweep).
    "q136_knn_recall_eval": [("variant", "string"), ("n_queries", "bigint"), ("mean_recall", "double")],
    "q137_cms_topk": [("user_id", "bigint"), ("freq", "bigint"), ("cms_est", "bigint"), ("overestimate", "bigint")],
    "q138_srm_check": [("n_a", "bigint"), ("n_b", "bigint"), ("chi2", "double"), ("srm", "int")],
    "q139_ols_regression": [("n", "bigint"), ("beta0", "double"), ("beta1", "double"), ("beta2", "double"), ("r2", "double")],
    "q140_rfm_segmentation": [("r_q", "int"), ("f_q", "int"), ("m_q", "int"), ("n_customers", "bigint"), ("sum_monetary", "double")],
    # Round-9 demotions: the whole round-8 window (q143/q144, the r6
    # rotation block q53-q99, q145-q173, q141/q142) — all full-hash
    # green in CORRECTNESS_r08; demoted to clear the window for the 30
    # zero-evidence keys q174-q203 + the 8 round-9 additions + the 11
    # stalest rotations (q115 has no oracle, so no digest row).
    "q143_benford_check": [("digit", "int"), ("n", "bigint"), ("obs_share", "double"), ("exp_share", "double"), ("deviation", "double")],
    "q144_cuped_lift": [("n_a", "bigint"), ("n_b", "bigint"), ("theta", "double"), ("lift_raw", "double"), ("lift_cuped", "double"), ("var_reduction", "double")],
    "q93_unigram_logprob": [("doc_id", "bigint"), ("n_tokens", "bigint"), ("avg_logprob", "double")],
    "q94_token_entropy": [("doc_id", "bigint"), ("n_tokens", "bigint"), ("n_distinct", "bigint"), ("entropy", "double")],
    "q95_zipf_slope": [("n_terms", "bigint"), ("zipf_slope", "double"), ("zipf_r2", "double")],
    "q98_source_overlap": [("src_a", "string"), ("src_b", "string"), ("n_common", "bigint"), ("n_a", "bigint"), ("n_b", "bigint"), ("jaccard", "double")],
    "q53_rollup": [("event_type", "string"), ("hr", "int"), ("gid", "bigint"), ("n", "bigint"), ("sum_value", "double")],
    "q54_pivot": [("hr", "int"), ("n_click", "bigint"), ("n_error", "bigint"), ("n_purchase", "bigint"), ("n_signup", "bigint"), ("n_view", "bigint")],
    "q69_unpivot": [("hr", "int"), ("event_type", "string"), ("n", "bigint")],
    "q62_time_resample": [("event_type", "string"), ("hr", "timestamp"), ("n", "bigint"), ("sum_value", "double")],
    "q66_anomaly": [("event_type", "string"), ("hr", "timestamp"), ("n", "bigint"), ("z", "double")],
    "q86_feature_normalize": [("l_orderkey", "bigint"), ("l_linenumber", "int"), ("l_returnflag", "string"), ("minmax", "double"), ("zscore", "double")],
    "q92_ewma": [("user_id", "bigint"), ("event_id", "bigint"), ("ts", "timestamp_ntz"), ("value", "double"), ("ewma", "double")],
    "q56_vocab_topk": [("term", "string"), ("n", "bigint"), ("frac", "double"), ("vocab_rank", "int")],
    "q59_label_centroids": [("label", "int"), ("n_vectors", "bigint"), ("centroid", "string")],
    "q73_regex_extract": [("token", "string"), ("n", "bigint"), ("n_docs", "bigint")],
    "q99_dup_rate_by_source": [("source", "string"), ("n_docs", "bigint"), ("n_dupes", "bigint"), ("n_clusters", "bigint"), ("dup_rate", "double")],
    "q145_spearman_corr": [("n", "bigint"), ("n_qty_values", "bigint"), ("n_disc_values", "bigint"), ("spearman_rho", "double")],
    "q146_degree_distribution": [("degree", "bigint"), ("n_parts", "bigint"), ("share", "double")],
    "q147_activity_bitmap": [("n_active_days", "int"), ("n_users", "bigint"), ("n_streak3", "bigint")],
    "q148_decile_lift": [("decile", "int"), ("n_customers", "bigint"), ("n_urgent", "bigint"), ("urgent_rate", "double"), ("lift", "double"), ("cum_capture", "double")],
    "q149_wilson_ctr": [("event_type", "string"), ("n", "bigint"), ("s", "bigint"), ("p_hat", "double"), ("wilson_lo", "double"), ("wilson_hi", "double")],
    "q150_higher_moments": [("l_returnflag", "string"), ("n", "bigint"), ("mean_price", "double"), ("pop_stddev", "double"), ("skewness", "double"), ("ex_kurtosis", "double")],
    "q151_weighted_median": [("l_returnflag", "string"), ("n_rows", "bigint"), ("n_values", "bigint"), ("w_median", "double"), ("w_p90", "double")],
    "q152_theil_index": [("segment", "string"), ("n_customers", "bigint"), ("mean_spend", "double"), ("theil", "double")],
    "q153_cotype_jaccard": [("type_a", "string"), ("type_b", "string"), ("n_a", "bigint"), ("n_b", "bigint"), ("n_both", "bigint"), ("jaccard", "double")],
    "q154_burstiness": [("b_bin", "int"), ("n_users", "bigint")],
    "q155_abc_analysis": [("abc_class", "string"), ("n_parts", "bigint"), ("revenue", "double"), ("rev_share", "double"), ("n_bins", "bigint")],
    "q156_ks_drift": [("event_type", "string"), ("n_first", "bigint"), ("n_second", "bigint"), ("ks_stat", "double"), ("ks_crit", "double"), ("drift_flag", "int")],
    "q157_lorenz_gini": [("n_customers", "bigint"), ("n_bins", "bigint"), ("gini", "double"), ("top_decile_share", "double"), ("bottom_half_share", "double")],
    "q158_holt_forecast": [("day", "date"), ("revenue", "double"), ("one_step_pred", "double"), ("abs_err", "double")],
    "q159_session_entropy": [("ent_bin", "int"), ("n_sessions", "bigint"), ("avg_events", "double")],
    "q160_cohort_ltv": [("cohort_ym", "int"), ("month_offset", "int"), ("cohort_size", "bigint"), ("period_rev", "double"), ("cum_ltv_per_cust", "double")],
    "q161_triple_itemsets": [("brand_a", "string"), ("brand_b", "string"), ("brand_c", "string"), ("n_triple", "bigint"), ("support", "double"), ("lift", "double")],
    "q162_chi2_independence": [("n", "bigint"), ("n_rows", "bigint"), ("n_cols", "bigint"), ("dof", "bigint"), ("chi2", "double"), ("cramers_v", "double")],
    "q163_heaps_law": [("bucket", "int"), ("n_docs", "bigint"), ("cum_tokens", "bigint"), ("cum_vocab", "bigint"), ("vocab_token_ratio", "double")],
    "q164_interpurchase_intervals": [("segment", "string"), ("n_gaps", "bigint"), ("median_days", "int"), ("p90_days", "int"), ("avg_days", "double")],
    "q165_neyman_allocation": [("event_type", "string"), ("n_rows", "bigint"), ("stddev", "double"), ("neyman_share", "double"), ("allocated_n", "bigint")],
    "q166_sprt_boundary": [("day", "date"), ("cum_trials", "bigint"), ("cum_conv", "bigint"), ("cum_llr", "double"), ("decision", "string")],
    "q167_curriculum_buckets": [("quality_tercile", "int"), ("length_tercile", "int"), ("n_docs", "bigint"), ("sum_tokens", "bigint"), ("doc_share", "double")],
    "q168_source_token_budget": [("source", "string"), ("quality_rank", "int"), ("avg_quality", "double"), ("n_tokens", "bigint"), ("take_tokens", "bigint"), ("cum_tokens_after", "bigint")],
    "q169_dsir_weights": [("doc_id", "bigint"), ("n_feats", "bigint"), ("weight", "double")],
    "q170_semdedup": [("vec_id", "bigint"), ("label", "int"), ("max_lower_cos", "double"), ("removed", "boolean")],
    "q171_dup_span_fraction": [("doc_id", "bigint"), ("n_tokens", "bigint"), ("covered", "bigint"), ("dup_frac", "double")],
    "q172_markov_transitions": [("prev_type", "string"), ("next_type", "string"), ("n", "bigint"), ("p", "double")],
    "q173_length_retention_sweep": [("threshold", "int"), ("n_docs", "bigint"), ("n_chars_kept", "bigint"), ("doc_frac", "double"), ("char_frac", "double")],
    "q141_association_rules": [("antecedent", "string"), ("consequent", "string"), ("n_pair", "bigint"), ("support", "double"), ("confidence", "double"), ("lift", "double")],
    "q142_autocorrelation": [("lag", "int"), ("n", "bigint"), ("acf", "double")],
    "q133_boilerplate_chunks": [("h", "string"), ("chunk_text", "string"), ("n_docs", "bigint"), ("n_occ", "bigint"), ("n_sources", "bigint")],
    "q134_dedup_impact": [("source", "string"), ("n_docs", "bigint"), ("n_kept", "bigint"), ("tokens_total", "bigint"), ("tokens_kept", "bigint"), ("pct_tokens_dropped", "double")],
    "q135_time_weighted_avg": [("event_type", "string"), ("n_segments", "bigint"), ("span_sec", "double"), ("twa_value", "double"), ("plain_avg", "double")],
    "q97_data_profile": [("col_name", "string"), ("n_rows", "bigint"), ("n_null", "bigint"), ("n_distinct", "bigint"), ("min_num", "double"), ("max_num", "double"), ("avg_num", "double"), ("min_str", "string"), ("max_str", "string")],
    "q100_scd2_history": [("user_id", "bigint"), ("version", "bigint"), ("event_type", "string"), ("valid_from", "timestamp_ntz"), ("valid_to", "timestamp_ntz"), ("n_events", "bigint")],
    "q101_incremental_rollup": [("event_type", "string"), ("day", "date"), ("n", "bigint"), ("sum_value", "double"), ("min_value", "double"), ("max_value", "double"), ("avg_value", "double")],
    "q102_heavy_hitters": [("user_id", "bigint"), ("freq", "bigint"), ("share", "double")],
    "q103_corr_matrix": [("col_a", "string"), ("col_b", "string"), ("n", "bigint"), ("corr", "double")],
    "q104_fk_audit": [("child_table", "string"), ("fk_col", "string"), ("parent_table", "string"), ("n_child", "bigint"), ("n_orphan", "bigint"), ("orphan_rate", "double")],
    "q105_cohort_retention": [("cohort_wk", "date"), ("week_offset", "bigint"), ("n_active", "bigint"), ("cohort_size", "bigint"), ("retention", "double")],
    "q106_session_concurrency": [("day", "date"), ("max_concurrent", "bigint")],
    "q107_rolling_active_users": [("day", "date"), ("dau", "bigint"), ("wau", "bigint"), ("stickiness", "double")],
    "q108_time_to_convert": [("n_converted", "bigint"), ("n_signups", "bigint"), ("conversion_rate", "double"), ("min_sec", "double"), ("p50_sec", "double"), ("p90_sec", "double"), ("max_sec", "double")],
    "q109_transition_matrix": [("src", "string"), ("dst", "string"), ("n", "bigint"), ("p", "double")],
    "q110_ab_lift": [("n_a", "bigint"), ("conv_a", "bigint"), ("rate_a", "double"), ("n_b", "bigint"), ("conv_b", "bigint"), ("rate_b", "double"), ("lift", "double"), ("z", "double")],
    "q111_fulfillment_lag": [("o_orderpriority", "string"), ("n_orders", "bigint"), ("avg_days", "double"), ("p50_days", "double"), ("p90_days", "double")],
    "q58_domain_mix": [("doc_id", "bigint"), ("source", "string"), ("sample_rank", "int")],
    "q81_hash_split": [("doc_id", "bigint"), ("split", "string"), ("n_chars", "bigint")],
    "q82_bpe_pairs": [("pair", "string"), ("n", "bigint")],
    "q91_corpus_pipeline": [("lang", "string"), ("source", "string"), ("n_docs", "bigint"), ("n_kept", "bigint"), ("kept_tokens", "bigint")],
    # (q53/q54/q56/q59/q62/q66/q69/q73/q86/q92/q99 promoted back into
    # the round-8 window — r6-only evidence, stalest first.)
    # Long-demoted keys (full-hash green in rounds 1-4)
    # Mid-round-9 demotions: 8 of the 11 r4-stale rotation keys ceded
    # their window slots to the q212-q219 additions (first-time
    # full-hash evidence outranks a staleness refresh); digest-pinned
    # here until they rotate back in round 10.
    # Round-10 demotions: the whole round-9 window (q174-q203, the
    # q204-q219 additions, the q10/q14/q16 rotations) - all full-hash
    # green in CORRECTNESS_r09 (50/50, zero err rows); demoted to
    # clear the window for the round-10 freshness rotation (the 9
    # r4-stale + 40 r5-stale keys promoted out of this dict).
    "q174_gopher_rules": [("doc_id", "bigint"), ("source", "string"), ("n_words", "bigint"), ("mean_word_len", "double"), ("n_stop", "bigint"), ("alpha_frac", "double"), ("r_count", "int"), ("r_wordlen", "int"), ("r_stop", "int"), ("r_alpha", "int"), ("pass_all", "int")],
    "q175_lsh_curve_planner": [("bands", "int"), ("rows_per_band", "int"), ("n_true_pairs", "bigint"), ("exp_recall", "double"), ("worst_pair_prob", "double"), ("prob_at_threshold", "double")],
    "q176_quantization_error": [("label", "int"), ("n_vectors", "bigint"), ("avg_cosine", "double"), ("min_cosine", "double"), ("avg_max_abs_err", "double"), ("avg_scale", "double")],
    "q177_kaplan_meier": [("duration", "bigint"), ("n_risk", "bigint"), ("n_events", "bigint"), ("n_censored", "bigint"), ("survival", "double")],
    "q178_kneser_ney_logprob": [("doc_id", "bigint"), ("n_bigrams", "bigint"), ("avg_logprob", "double")],
    "q179_jsd_source_divergence": [("source", "string"), ("jsd", "double"), ("jsd_distance", "double")],
    "q180_jackknife_ci": [("n_users", "bigint"), ("n_groups", "bigint"), ("conv_rate", "double"), ("jk_se", "double"), ("ci_lo", "double"), ("ci_hi", "double")],
    "q181_power_analysis": [("mde_rel", "double"), ("p1", "double"), ("p2", "double"), ("n_per_arm", "bigint"), ("days_to_run", "bigint")],
    "q182_embedding_dim_profile": [("dim", "int"), ("n_vectors", "bigint"), ("mean_val", "double"), ("var_val", "double"), ("var_share", "double")],
    "q183_embedding_corr_pairs": [("dim_a", "int"), ("dim_b", "int"), ("n_vectors", "bigint"), ("corr", "double")],
    "q184_mann_whitney": [("n_a", "bigint"), ("n_b", "bigint"), ("u_a", "double"), ("z", "double"), ("rank_biserial", "double")],
    "q185_rrf_fusion": [("doc_id", "bigint"), ("bm25_rank", "int"), ("cosine_rank", "int"), ("rrf_score", "double")],
    "q186_pagerank_types": [("event_type", "string"), ("n_out", "bigint"), ("pagerank", "double")],
    "q187_raking_weights": [("source", "string"), ("lang", "string"), ("n_docs", "bigint"), ("weight", "double")],
    "q188_hash_collision_audit": [("width", "int"), ("n_terms", "bigint"), ("n_buckets_used", "bigint"), ("collided_buckets", "bigint"), ("collision_mass_share", "double")],
    "q189_shapley_attribution": [("channel", "string"), ("n_exposed", "bigint"), ("shapley", "double")],
    "q190_markov_attribution": [("channel", "string"), ("removal_effect", "double"), ("attribution", "double")],
    "q191_winsorized_stats": [("n_users", "bigint"), ("mean_raw", "double"), ("std_raw", "double"), ("mean_winsor", "double"), ("std_winsor", "double"), ("mean_trim", "double"), ("n_trim", "bigint")],
    "q192_poisson_bootstrap": [("n_users", "bigint"), ("n_replicas", "int"), ("mean_raw", "double"), ("boot_se", "double")],
    "q193_join_cardinality_audit": [("n_keys", "bigint"), ("total_rows", "bigint"), ("total_pairs", "bigint"), ("max_key_pairs", "bigint"), ("top1_share", "double"), ("skew_ratio", "double")],
    "q194_forecast_baselines": [("n_days", "bigint"), ("mae_naive", "double"), ("mae_snaive", "double"), ("mape_naive", "double"), ("mape_snaive", "double"), ("snaive_vs_naive", "double")],
    "q195_did_lift": [("n_obs", "bigint"), ("treat_pre", "double"), ("treat_post", "double"), ("ctrl_pre", "double"), ("ctrl_post", "double"), ("did", "double"), ("se", "double"), ("z", "double")],
    "q196_auc_score": [("n_pos", "bigint"), ("n_neg", "bigint"), ("auc", "double"), ("gini", "double")],
    "q197_calibration_bins": [("bin", "int"), ("n_users", "bigint"), ("avg_score", "double"), ("conv_rate", "double")],
    "q198_metric_family_readout": [("metric", "string"), ("mean_a", "double"), ("mean_b", "double"), ("z", "double"), ("holm_rank", "int"), ("z_crit", "double"), ("significant", "int")],
    "q199_variance_reduction_report": [("n_users", "bigint"), ("theta", "double"), ("se_raw", "double"), ("se_cuped", "double"), ("se_winsor", "double"), ("vr_cuped", "double"), ("vr_winsor", "double")],
    "q200_discount_elasticity": [("brand", "string"), ("n_items", "bigint"), ("elasticity", "double"), ("r2", "double")],
    "q201_asof_snapshot": [("user_id", "bigint"), ("version", "bigint"), ("event_type", "string"), ("valid_from", "timestamp_ntz"), ("n_events", "bigint")],
    "q202_dedup_method_agreement": [("n_docs", "bigint"), ("n_lexical_dropped", "bigint"), ("n_semantic_dropped", "bigint"), ("n_both", "bigint"), ("jaccard", "double"), ("pct_agree", "double")],
    "q203_sample_representativeness": [("event_type", "string"), ("n_pop", "bigint"), ("n_sample", "bigint"), ("sampling_frac", "double"), ("mean_pop", "double"), ("mean_sample", "double"), ("z", "double")],
    "q204_attribution_outer": [("user_id", "bigint"), ("view_id", "bigint"), ("view_ts", "timestamp_ntz"), ("purchase_id", "bigint"), ("purchase_ts", "timestamp_ntz"), ("purchase_value", "double")],
    "q205_stream_enrich": [("event_id", "bigint"), ("user_id", "bigint"), ("user_name", "string"), ("nationkey", "int"), ("event_type", "string"), ("value", "double")],
    "q206_sparse_cosine": [("doc_a", "bigint"), ("doc_b", "bigint"), ("cosine", "double")],
    "q207_bh_fdr": [("metric", "string"), ("mean_a", "double"), ("mean_b", "double"), ("z", "double"), ("bh_rank", "int"), ("z_crit", "double"), ("significant", "int")],
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
    "q10_distinct_users": [("n_distinct_users", "bigint"), ("n_events", "bigint")],
    "q14_intersect": [("user_id", "bigint")],
    "q16_string_funcs": [("doc_id", "bigint"), ("n_tokens", "int"), ("first_word", "string"), ("last_word", "string"), ("head_upper", "string"), ("lang_src", "string"), ("text_len", "int")],
    # Round-11 demotions: the whole round-10 window (the 9 r4-stale +
    # 40 r5-stale freshness rotations) - all full-hash green in
    # CORRECTNESS_r10 (50/50, zero err rows); demoted to clear the
    # window for the round-11 rotation (the 9 deferred r5-stale keys,
    # the 16 r6-stale keys, and 20 single-r7-evidence keys promoted
    # out of this dict; q84/q31_simhash/q10_approx/q77 enter the
    # window too but are rows-only by design - never digest rows).
    "q15_union": [("event_id", "bigint"), ("ts", "timestamp_ntz"), ("user_id", "bigint"), ("event_type", "string"), ("value", "double")],
    "q17_date_funcs": [("event_date", "date"), ("hr", "int"), ("day_name", "string"), ("n_events", "bigint"), ("n_users", "bigint")],
    "q18_json_funcs": [("event_type", "string"), ("n_events", "bigint"), ("max_k", "bigint"), ("sum_k", "bigint"), ("avg_k", "double"), ("n_high", "bigint")],
    "q23_pandas_udf": [("event_type", "string"), ("speed_decile", "bigint"), ("n_events", "bigint")],
    "q23_pandas_udaf": [("event_type", "string"), ("value_spread", "double")],
    "q24_explode": [("label", "int"), ("pos", "int"), ("n_vals", "bigint"), ("min_val", "double"), ("max_val", "double"), ("avg_val", "double")],
    "q33_text_stats": [("lang", "string"), ("source", "string"), ("n_docs", "bigint"), ("sum_tokens", "bigint"), ("avg_tokens", "double"), ("avg_chars", "double"), ("min_chars", "bigint"), ("max_chars", "bigint")],
    "q37_token_count": [("lang", "string"), ("n_docs", "bigint"), ("ws_tokens", "bigint"), ("alpha_tokens", "bigint"), ("num_tokens", "bigint"), ("punct_tokens", "bigint")],
    "q38_fingerprint": [("doc_id", "bigint"), ("fingerprint", "string"), ("n_uniq_tokens", "int")],
    "q01_filter_range": [("event_id", "bigint"), ("ts", "timestamp_ntz"), ("user_id", "bigint"), ("event_type", "string"), ("value", "double")],
    "q02_group_count": [("event_type", "string"), ("n_events", "bigint"), ("n_users", "bigint"), ("sum_value", "double"), ("avg_value", "double")],
    "q03_star_join": [("r_name", "string"), ("n_name", "string"), ("revenue", "double"), ("n_orders", "bigint")],
    "q04_monitor_state": [("n_name", "string"), ("n_suppliers", "bigint"), ("n_active", "bigint"), ("n_silent", "bigint")],
    "q05_missing_cameras": [("s_suppkey", "bigint"), ("s_name", "string")],
    "q06_topn": [("user_id", "bigint"), ("n_events", "bigint")],
    "q06_topn_details": [("event_id", "bigint"), ("ts", "timestamp_ntz"), ("user_id", "bigint"), ("event_type", "string"), ("value", "double")],
    "q07_speed_buckets": [("event_type", "string"), ("n_high", "bigint"), ("n_medium", "bigint"), ("n_normal", "bigint"), ("n_low", "bigint")],
    "q08_stratified_sample": [("stratum_hour", "timestamp"), ("event_id", "bigint"), ("user_id", "bigint"), ("event_type", "string"), ("value", "double")],
    "q11_topk_per_group": [("event_type", "string"), ("user_id", "bigint"), ("n_events", "bigint"), ("rn", "int")],
    "q13_follow_within": [("leader_id", "bigint"), ("follower_id", "bigint"), ("n_follow", "bigint")],
    "q19_funnel": [("step", "int"), ("step_type", "string"), ("n_users", "bigint"), ("rate", "double")],
    "q20_sliding_window": [("window_start", "timestamp_ntz"), ("window_end", "timestamp_ntz"), ("event_type", "string"), ("n_events", "bigint"), ("sum_value", "double"), ("avg_value", "double")],
    "q22_session_window": [("user_id", "bigint"), ("session_start", "timestamp_ntz"), ("session_end", "timestamp_ntz"), ("n_events", "bigint")],
    "q_stream_avg": [("event_type", "string"), ("n_events", "bigint"), ("avg_speed", "double")],
    "q85_window_dedup": [("event_id", "bigint"), ("user_id", "bigint"), ("event_type", "string"), ("ts", "timestamp_ntz")],
    "q51_asof_join": [("event_id", "bigint"), ("user_id", "bigint"), ("ts", "timestamp_ntz"), ("o_orderkey", "bigint"), ("o_orderdate", "timestamp_ntz")],
    "q89_asof_forward": [("o_orderkey", "bigint"), ("user_id", "bigint"), ("o_orderdate", "timestamp_ntz"), ("event_id", "bigint"), ("event_ts", "timestamp_ntz")],
    "q30_exact_dedup": [("content_hash", "string"), ("doc_id", "bigint"), ("n_copies", "bigint")],
    "q31_near_dedup": [("doc_a", "bigint"), ("doc_b", "bigint"), ("jaccard", "double")],
    "q31_minhash_lsh": [("doc_a", "bigint"), ("doc_b", "bigint"), ("jaccard", "double")],
    "q31_simhash_md5": [("doc_a", "bigint"), ("doc_b", "bigint"), ("hamming", "int")],
    "q46_dedup_clusters": [("doc_id", "bigint"), ("canonical_id", "bigint"), ("is_canonical", "int")],
    "q90_containment_dedup": [("doc_a", "bigint"), ("doc_b", "bigint"), ("containment", "double")],
    "q32_knn_cosine": [("qid", "bigint"), ("nid", "bigint"), ("cosine", "double"), ("knn_rank", "int")],
    "q32_knn_ivf": [("qid", "bigint"), ("nid", "bigint"), ("cosine", "double"), ("knn_rank", "int")],
    "q32_knn_lsh": [("qid", "bigint"), ("nid", "bigint"), ("cosine", "double"), ("knn_rank", "int")],
    "q35_embed_near_dup": [("vec_a", "bigint"), ("vec_b", "bigint"), ("cosine", "double")],
    "q44_int8_quantize": [("vec_id", "bigint"), ("label", "int"), ("scale", "double"), ("qv", "string"), ("max_abs_err", "double")],
    "q36_langid": [("actual_lang", "string"), ("predicted_lang", "string"), ("n_docs", "bigint")],
    "q39_quality_score": [("doc_id", "bigint"), ("n_tokens", "int"), ("uniq_ratio", "double"), ("avg_token_len", "double"), ("stop_ratio", "double"), ("quality", "string")],
    "q43_chunk_split": [("doc_id", "bigint"), ("chunk_idx", "bigint"), ("chunk_text", "string"), ("n_tokens", "bigint")],
    "q45_repetition": [("doc_id", "bigint"), ("n_grams", "bigint"), ("n_dup_grams", "bigint"), ("dup_ratio", "double"), ("is_repetitive", "int")],
    "q34_multimodal_join": [("label", "int"), ("lang", "string"), ("n_docs", "bigint"), ("sum_chars", "bigint"), ("avg_chars", "double"), ("min_doc_id", "bigint")],
    "q47_pii_redact": [("doc_id", "bigint"), ("n_emails", "int"), ("n_phones", "int"), ("redacted", "string")],
    "q48_tfidf": [("doc_id", "bigint"), ("term", "string"), ("tf", "bigint"), ("df", "bigint"), ("tfidf", "double"), ("term_rank", "int")],
    "q49_pack_sequences": [("doc_id", "bigint"), ("source", "string"), ("n_tokens", "bigint"), ("bin_id", "bigint"), ("pack_offset", "bigint")],
    "q50_decontaminate": [("doc_id", "bigint"), ("n_shared_grams", "bigint")],
    "q88_keep_best_per_cluster": [("canonical_id", "bigint"), ("best_doc_id", "bigint"), ("cluster_size", "bigint"), ("best_quality", "string"), ("best_n_tokens", "int")],
    "q68_attribution_join": [("user_id", "bigint"), ("view_id", "bigint"), ("view_ts", "timestamp_ntz"), ("purchase_id", "bigint"), ("purchase_ts", "timestamp_ntz"), ("purchase_value", "double")],
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
