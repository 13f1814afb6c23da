"""Query registry: every operator from SURVEY.md §2 lands here as a
named (PySpark query, DuckDB oracle SQL) pair.

``__spark_entry__.queries()`` / ``oracle_sql()`` and ``bench.py`` read
this registry.  Registration is decorator-based so each module can
declare its pairs next to the implementation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
BENCH_QUERIES: list[str] = []


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Register a (spark, sf_dir) -> DataFrame callable, optionally with
    a DuckDB oracle SQL string and bench-suite membership."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if bench:
            BENCH_QUERIES.append(name)
        return fn

    return deco


def _load_all() -> None:
    # Import for registration side effects.  Registration order is the
    # driver's verification order: round 1 only checked the first 50
    # registered queries, so the modules that went unverified that round
    # (windows, events, llm, multimodal, streaming, skew) now register
    # FIRST, and the 49 already-green core/joins/aggregates pairs last.
    from cascading_hbase_spark.queries import windows  # noqa: F401
    from cascading_hbase_spark.queries import events  # noqa: F401
    from cascading_hbase_spark.queries import llm  # noqa: F401
    from cascading_hbase_spark.queries import multimodal  # noqa: F401
    from cascading_hbase_spark.queries import streaming  # noqa: F401
    from cascading_hbase_spark.queries import skew  # noqa: F401
    from cascading_hbase_spark.queries import core  # noqa: F401
    from cascading_hbase_spark.queries import joins  # noqa: F401
    from cascading_hbase_spark.queries import aggregates  # noqa: F401
    from cascading_hbase_spark.queries import tpch  # noqa: F401


# Queries the driver's per-round budget (~50 checked per round) must hit
# FIRST this round (VERDICT r04 item 1): every r04-and-earlier action
# item is closed, so the budget rotates the STALEST driver verdicts —
# queries changed/added this round first (the standing rule), then the
# 44 pairs whose only driver verdict dates from round 1, then the 35
# from round 2 (testdata is regenerated per round, so verdict age is
# the weakest link in the CORRECTNESS artifact).
_PRIORITY = [
    # --- driver-budget head: the most algorithmically intricate of the
    #     ~95 never-driver-verified round-5 pairs go first (the ~50/round
    #     budget should land on the riskiest algorithms; the rest rotate
    #     in r06)
    "bpe_merges_learn",                  # new: BPE trainer, hash-checked
    "bpe_compression_ratio",             # new: learned-tokenizer audit
    "lm_trigram_backoff",                # new: held-out stupid backoff LM
    "trigram_novelty_per_doc",           # new: corpus novelty decay
    "copurchase_triangles",              # new: oriented-wedge triangles
    "itemcf_recommendations",            # new: item-item cosine top-5
    "auc_rank_sum",                      # new: Mann-Whitney AUC, bucketed
    "quantization_recall_audit",         # new: int8-vs-float recall@10
    "segment_n50_concentration",         # new: grouped_running_sum N50
    "mann_kendall_theil_sen",            # new: nonparametric trend + slope
    "scd2_intervals",                    # new: SCD2 validity intervals
    "out_of_order_audit",                # new: watermark-sizing histogram
    "buffer_apply_in_pandas",            # regrouped coarse-key Buffer demo
    "graph_bfs_hops",                    # new: bounded frontier BFS
    "cuped_adjusted_lift",               # new: CUPED variance reduction
    "copurchase_link_prediction_recall", # new: temporal-holdout eval
    "peak_concurrency_sweepline",        # new: interval-overlap counting
    "exact_grouped_median_scalable",     # new: exact median, scale path
    # --- changed or new in round 5 (appended as they land)
    "q15_top_supplier",        # persist -> max() OVER () rewrite
    "heavy_hitters_sketch",    # persist -> sum(c) OVER () rewrite
    "lm_bigram_logprob",       # third corpus pass -> window over model
    "fuzzy_name_join_deletion_blocked",  # new: full-recall ER blocking
    "fuzzy_join_blocking_audit",         # new: recall measurement
    "dedup_minhash_lsh_capped",          # new: mega-bucket guard
    "q21_suppliers_kept_waiting",        # new: Q21 via order-stats rewrite
    "perplexity_bucket_ccnet",           # new: per-lang LM quantiles
    "setsim_prefix_jaccard",             # new: PPJoin prefix filtering
    "mad_outliers_robust",               # new: median/MAD outlier gate
    "hard_negative_mining",              # new: contrastive negatives
    "max_drawdown_per_user",             # new: running-peak drawdown
    "mode_per_group_deterministic",      # new: tie-broken mode
    "global_row_index",                  # new: scalable zipWithIndex
    "twap_per_user",                     # new: time-weighted average
    "sequence_funnel_3step",             # new: CEP state-machine fold
    "winsorize_clip",                    # new: p01/p99 group clamp
    "market_basket_pairs",               # new: co-purchase counts
    "decayed_popularity",                # new: 2^-weeks decay weights
    "fk_violation_report",               # new: referential-integrity audit
    "event_transition_matrix",           # new: Markov journey matrix
    "label_centroid_similarity",         # new: label-confusion audit
    "pareto_revenue_share",              # new: bucketed running sum
    "rolling_7d_active_users",           # new: WAU via window explode
    "psi_distribution_drift",            # new: PSI drift monitor
    "daily_count_anomaly",               # new: trailing-window z-score
    "pmi_collocations",                  # new: collocation mining
    "conversion_latency_deciles",        # new: time-to-convert curve
    "source_overlap_jaccard",            # new: source-level mirror detector
    "dup_cluster_size_histogram",        # new: dup-inflation profile
    "session_bounce_dwell",              # new: bounce/dwell by entry
    "longest_streak_per_user",           # new: islands-on-position runs
    "idf_novelty_score",                 # new: doc-level rarity signal
    "bm25_topk",                         # new: sparse-retrieval ranker
    "substring_dup_spans",               # new: Lee-et-al span-level dedup
    "cms_frequency_contract",            # new: bit-identical count-min sketch
    "ab_conversion_ztest",               # new: two-proportion experiment test
    "cohort_ltv_triangle",               # new: cohort-age revenue triangle
    "session_path_topk",                 # new: first-5-event path mining
    "decile_lift_table",                 # new: targeting lift/capture table
    "zipf_fit_slope",                    # new: token-spectrum health check
    "poisson_bootstrap_ci",              # new: hash-deterministic bootstrap CI
    "rfm_quintile_features",             # new: RFM segmentation quintiles
    "random_projection_jl",              # new: JL sign-matrix projection audit
    "knn_label_purity",                  # new: leave-one-out 5-NN label audit
    "weighted_quantiles",                # new: weighted median via running sum
    "skyline_price_quantity",            # new: Pareto frontier via running max
    "cusum_changepoint",                 # new: CUSUM drift detector
    "seasonal_naive_mase",               # new: forecast-skill baseline
    "benford_digit_audit",               # new: first-digit anomaly screen
    "gini_concentration",                # new: revenue inequality index
    "heaps_law_fit",                     # new: vocabulary-growth exponent
    "kaplan_meier_retention",            # new: censored survival curve
    "price_elasticity_by_brand",         # new: log-log demand slope
    "contingency_association",           # new: chi2/CramersV/MI triple
    "acf_daily_counts",                  # new: autocorrelation lags 1-7
    "correlation_matrix",                # new: one-pass pairwise Pearson
    "ks_two_sample_chars",               # new: exact 2-sample KS statistic
    "entropy_rate_markov",               # new: next-action predictability
    "interevent_burstiness",             # new: Goh-Barabasi burstiness index
    "lang_diversity_simpson",            # new: per-source diversity triple
    "keyness_loglikelihood_tokens",      # new: Dunning G2 keyness top-30
    "ccf_clicks_purchases",              # new: lead-lag cross-correlation
    "dow_detrended_anomaly",             # new: weekday-median robust anomaly
    "hll_overlap_estimate",              # new: sketch-algebra set overlap
    "kfold_assignment_report",           # new: deterministic CV folds
    "welch_ttest_value",                 # new: unequal-variance metric test
    "calibration_bins",                  # new: reliability diagram / ECE
    "spearman_by_brand",                 # new: midrank Spearman via counts
    "copurchase_degree_distribution",    # new: graph shape check
    "join_key_skew_report",              # new: shuffle-key skew diagnostics
    "horvitz_thompson_revenue",          # new: stratified HT estimator audit
    "ols_two_factor",                    # new: one-pass normal equations
    "embedding_dim_profile",             # new: per-dimension health check
    "stl_lite_decompose",                # new: trend/seasonal/residual
    "quality_percentile_by_source",      # new: per-source quantile norm
    "gopher_quality_rules",              # new: rule-vector quality gate
    "dau_mau_stickiness",                # new: trailing-30d engagement
    # --- last driver verdict r01 (registration order)
    "each_identity",
    "regex_splitter",
    "expression_function",
    "regex_filter",
    "filter_bool_combinators",
    "filter_null",
    "insert_literal",
    "regex_parser",
    "regex_replace",
    "regex_generator",
    "date_formatter",
    "date_parser",
    "field_joiner",
    "field_formatter",
    "ungroup_unpivot",
    "pivot_agg",
    "merge_union",
    "intersect_op",
    "except_op",
    "json_extract",
    "string_scalar_funcs",
    "bytes_codec",
    "cogroup_inner",
    "cogroup_left",
    "cogroup_right",
    "cogroup_outer",
    "cogroup_mixed_nary",
    "self_join",
    "semi_join",
    "anti_join",
    "broadcast_dim_join",
    "agg_pricing_summary",
    "groupby_count",
    "groupby_first_last",
    "unique_distinct",
    "percentile_agg",
    "count_distinct",
    "rollup_agg",
    "cube_agg",
    "grouping_sets",
    "secondary_sort_first",
    "topk_per_group",
    "global_sort_limit",
    # --- last driver verdict r02 (registration order; the ~50 budget
    #     reaches partway in — the rest head next round's rotation)
    "window_ntile_firstlast",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "event_dedup_earliest",
    "asof_join_last_signup",
    "funnel_signup_to_purchase",
    "event_rate_per_user_hour",
    "retention_cohorts",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "similarity_cosine_topk",
    "embedding_neardup",
    "embedding_stats",
    "text_stats",
    "token_count_regex",
    "lang_id_heuristic",
    "quality_score",
    "text_clean_pipeline",
    "dedup_cluster_keep_best",
    "stratified_sample_hash",
    "token_budget_cap",
    "doc_fingerprint",
    "multimodal_image_features",
    "multimodal_resize_plan",
    "multimodal_frame_sample",
    "multimodal_frame_slices",
    "multimodal_audio_stats",
    "streaming_tumbling_window_agg",
    "streaming_session_window_agg",
    "streaming_sliding_window_agg",
    "streaming_dedup_within_watermark",
    "streaming_user_running_totals",
    "salted_two_phase_agg",
    "salted_join_rollup",
]


def _reorder() -> None:
    head = [k for k in _PRIORITY if k in QUERIES]
    order = head + [k for k in QUERIES if k not in head]
    for d in (QUERIES, ORACLES):
        snap = dict(d)
        d.clear()
        d.update({k: snap[k] for k in order if k in snap})


_load_all()
_reorder()
