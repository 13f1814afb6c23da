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
# FIRST this round (VERDICT r03 items 1-2): the 7 §2 cells that have
# never received a driver row, then the 8 queries whose driver verdicts
# predate a rewrite (array-form MinHash 61298a3, zero-shuffle SimHash
# e8b9fe9, keyed-layer rework), then any pair new or changed this round.
_PRIORITY = [
    # --- never driver-verified (VERDICT r03 rows 52/66/68/75/82/83/88)
    "range_bin_join",
    "heavy_hitters_sketch",
    "window_count_distinct",
    "union_evolved_schema",
    "stats_corr_covar",
    "array_scalar_funcs",
    "window_ratio_to_report",
    # --- rewritten since their last driver verdict
    "dedup_minhash_lsh",
    "neardup_clusters",
    "dedup_incremental_vs_corpus",
    "simhash_fingerprint",
    "simhash_neardup",
    "keyed_upsert_lww",
    "keyed_range_scan",
    "keyed_delete_antijoin",
    # --- new or oracle-changed in round 4 (appended as they land)
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q12_late_shipment_priority",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q19_bracket_revenue",
    "q22_idle_customers",
    "doc_chunk_windows",
    "lm_bigram_logprob",
    "weighted_sample_per_source",
    "ema_user_value",
    "histogram_equidepth",
    "attribution_linear",
    # asof_join gained the row-wise struct carry this round: its r03
    # verdicts predate the rewrite
    "asof_join_generic",
    "asof_join_tolerance",
    "asof_join_forward",
    # broadcast-hint hygiene (hints dropped from SF-scaling sides) —
    # plans changed, so re-verify
    "join_star_revenue",
    "range_predicate_join",
    "correlated_avg_filter",
    "leakage_safe_split",
    "bloom_semi_filter_contract",
    "grouped_agg_pandas_udf",
    "event_seasonality_profile",
    "monthly_yoy_growth",
    "fuzzy_name_join",
    "collect_set_csv",
    "bitwise_agg_flags",
    "regexp_extract_all_funcs",
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
