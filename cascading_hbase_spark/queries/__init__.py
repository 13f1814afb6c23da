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
# FIRST this round (VERDICT r05 item 1: consolidation — freeze surface
# growth, drain the verification backlog).  Head = the handful of pairs
# changed/added THIS round (standing rule), then the 46 round-5 pairs
# that have NEVER received a driver verdict (the r05 budget landed on
# the other 50 round-5 additions), then the 43 pairs whose newest
# verdict is r01-dated and the 35 r02-dated ones, oldest-first
# (testdata is regenerated per round, so verdict age is the weakest
# link in the CORRECTNESS artifact).  46 never + ~4 new/changed fills
# the ~50 budget exactly; the stale tail heads the r07 rotation.
_PRIORITY = [
    # --- changed or new in round 6
    "copurchase_triangles_capped",       # new: top-1%-degree hub cap
    "triangle_cap_audit",                # new: capped-vs-exact coverage
    "copurchase_triangles_estimate",     # new: DOULION sampled count
    "triangle_estimate_audit",           # new: estimate-vs-exact error
    "copurchase_triangles",              # edge builder got explicit cache
    "copurchase_degree_distribution",    # never-verified + edge-cache change
    # --- round-5 pairs with NO driver verdict yet (registration order)
    "idf_novelty_score",                 # doc-level rarity signal
    "bm25_topk",                         # sparse-retrieval ranker (bench)
    "substring_dup_spans",               # Lee-et-al span dedup (bench)
    "cms_frequency_contract",            # bit-identical count-min (bench)
    "ab_conversion_ztest",               # two-proportion experiment test
    "cohort_ltv_triangle",               # cohort-age revenue triangle
    "session_path_topk",                 # first-5-event path mining
    "decile_lift_table",                 # targeting lift/capture table
    "zipf_fit_slope",                    # token-spectrum health check
    "poisson_bootstrap_ci",              # hash-deterministic bootstrap CI
    "rfm_quintile_features",             # RFM segmentation quintiles
    "random_projection_jl",              # JL sign-matrix projection audit
    "knn_label_purity",                  # leave-one-out 5-NN label audit
    "weighted_quantiles",                # weighted median via running sum
    "skyline_price_quantity",            # Pareto frontier via running max
    "cusum_changepoint",                 # CUSUM drift detector
    "seasonal_naive_mase",               # forecast-skill baseline
    "benford_digit_audit",               # first-digit anomaly screen
    "gini_concentration",                # revenue inequality index
    "heaps_law_fit",                     # vocabulary-growth exponent
    "kaplan_meier_retention",            # censored survival curve
    "price_elasticity_by_brand",         # log-log demand slope
    "contingency_association",           # chi2/CramersV/MI triple
    "acf_daily_counts",                  # autocorrelation lags 1-7
    "correlation_matrix",                # one-pass pairwise Pearson
    "ks_two_sample_chars",               # exact 2-sample KS statistic
    "entropy_rate_markov",               # next-action predictability
    "interevent_burstiness",             # Goh-Barabasi burstiness index
    "lang_diversity_simpson",            # per-source diversity triple
    "keyness_loglikelihood_tokens",      # Dunning G2 keyness top-30
    "ccf_clicks_purchases",              # lead-lag cross-correlation
    "dow_detrended_anomaly",             # weekday-median robust anomaly
    "hll_overlap_estimate",              # sketch-algebra set overlap
    "kfold_assignment_report",           # deterministic CV folds
    "welch_ttest_value",                 # unequal-variance metric test
    "calibration_bins",                  # reliability diagram / ECE
    "spearman_by_brand",                 # midrank Spearman via counts
    "join_key_skew_report",              # shuffle-key skew diagnostics
    "horvitz_thompson_revenue",          # stratified HT estimator audit
    "ols_two_factor",                    # one-pass normal equations
    "embedding_dim_profile",             # per-dimension health check
    "stl_lite_decompose",                # trend/seasonal/residual
    "quality_percentile_by_source",      # per-source quantile norm
    "gopher_quality_rules",              # rule-vector quality gate
    "dau_mau_stickiness",                # trailing-30d engagement
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
