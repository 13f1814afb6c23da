"""Whole-registry physical-plan audit: every registered query's
executed plan is swept for the two absolute scale-killers —
CartesianProduct (quadratic pair blowup) and BatchEvalPython
(row-at-a-time Python in the hot path).  Zero tolerance, no allowlist:
if a new query trips this, fix the plan.

BroadcastNestedLoopJoin is different: it IS the right plan when a
constant-bounded side (a 1-row aggregate, a fixed query set, decile
cuts, a vocabulary) is broadcast against a non-equi condition — the
big side still streams map-side.  Those uses are PINNED by name below;
an unlisted query acquiring a BNL fails, so every new one is a
conscious decision (either the small side is provably bounded and gets
allowlisted, or the join needs an equi/bin key).
"""

from __future__ import annotations

import os

import pytest

from cascading_hbase_spark.queries import QUERIES

SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")

# Queries where a BroadcastNestedLoopJoin is the intended plan because
# the broadcast side is constant-bounded (does NOT scale with SF):
BNL_BY_DESIGN = {
    "lm_bigram_logprob",          # 1-row vocabulary size
    "lm_unigram_logprob",         # 1-row vocabulary size
    "perplexity_bucket_ccnet",    # 1-row vocab (scoring reuse)
    "fuzzy_join_blocking_audit",  # small-sf diagnostic by contract
    "hard_negative_mining",       # fixed query-vector set
    "similarity_cosine_topk",     # fixed query-vector set
    "similarity_ann_ivf_topk",    # fixed query set + centroid table
    "mixture_rebalance_sample",   # per-source count table (#sources rows)
    "quality_filter_percentile",  # 1-row percentile threshold
    "tfidf_top_terms",            # 1-row doc-count aggregate
    "token_dist_divergence",      # per-split distribution (vocab-bounded)
    "hll_sketch_merge_contract",  # 1-row sketch union
    "histogram_equidepth",        # 1-row decile-cuts aggregate
    "heavy_hitters_sketch",       # 1-row grand-total broadcast
    "q22_idle_customers",         # 1-row global-average balance
    "global_row_index",           # 1-row percentile cuts + B-row offsets
    "fk_violation_report",        # 1-row orphan count x 1-row total count
    "copurchase_triangles_capped",   # 1-row degree-cap threshold broadcast
    "triangle_cap_audit",            # 1-row threshold + five 1-row counts
    "copurchase_triangles_estimate", # two 1-row count aggregates crossed
    "triangle_estimate_audit",       # 1-row exact x 1-row estimate
    "decayed_popularity",         # 1-row max(ts) reference point
    "label_centroid_similarity",  # #labels-row centroid pair join
    "psi_distribution_drift",     # 1-row cuts + 10-row share spine
    "pmi_collocations",           # 1-row bigram-total broadcast
    "dup_cluster_size_histogram", # two 1-row count aggregates
    "idf_novelty_score",          # 1-row corpus doc count
    "pareto_revenue_share",       # 1-row cuts + B-row bases + 1-row total
    "bm25_topk",                  # 1-row corpus stats (N, avgdl)
    "decile_lift_table",          # 1-row doc count + enumeration cuts
    "poisson_bootstrap_ci",       # 1-row base mean/count broadcast
    "rfm_quintile_features",      # 1-row max(ts) + 1-row user count x3
    "knn_label_purity",           # fixed query-vector sample broadcast
    "weighted_quantiles",         # 1-row total weight + percentile cuts
    "skyline_price_quantity",     # 1-row percentile cuts broadcast
    "benford_digit_audit",        # 9-row digit relation x 1-row total
    "gini_concentration",         # 1-row enumeration cuts broadcast
    "heaps_law_fit",              # 20-row checkpoint spine broadcast
    "kaplan_meier_retention",     # 1-row horizon broadcast
    "contingency_association",    # #types x 7 table x 1-row totals
    "ks_two_sample_chars",        # 1-row totals + 1-row max broadcast
    "entropy_rate_markov",        # 1-row grand total + 1-row state count
    "keyness_loglikelihood_tokens",  # 1-row group-total broadcast
    "dow_detrended_anomaly",      # 1-row global MAD broadcast
    "hll_overlap_estimate",       # 1-row sketch algebra x 1-row exact overlap
    "auc_rank_sum",               # 1-row percentile cuts broadcast
    "lm_trigram_backoff",         # 1-row model totals (N, V) broadcast
    "out_of_order_audit",         # 1-row percentile cuts broadcast
    "quantization_recall_audit",  # fixed query-vector set (cosine_topk x2)
    "peak_concurrency_sweepline", # 1-row percentile cuts broadcast
    "cuped_adjusted_lift",        # 1-row midpoint + 1-row theta broadcasts
    "copurchase_link_prediction_recall",  # 2x1-row verdict cross
}


@pytest.fixture(scope="module")
def plans(spark):
    # streaming_* entries RUN a real streaming query and return the
    # drained memory-sink result — its plan is a LocalTableScan
    # that can never contain the patterns audited here, and
    # executing ~10 streams per audit session buys nothing.  Their
    # plan discipline is covered by tests/test_streaming.py.
    #
    # Planned with a driver thread pool: physical planning is
    # driver-side work whose py4j calls release the GIL, so 6 threads
    # cut this fixture from ~140 s serial to ~30 s (VERDICT r13 item
    # 2: the suite must fit the driver's verify window) with identical
    # coverage.
    from concurrent.futures import ThreadPoolExecutor

    names = [n for n in QUERIES if not n.startswith("streaming_")]

    def plan(name: str) -> str:
        return (
            QUERIES[name](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    with ThreadPoolExecutor(max_workers=6) as pool:
        return dict(zip(names, pool.map(plan, names)))


def test_no_cartesian_anywhere(plans):
    hits = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not hits, f"cartesian product in: {hits}"


def test_no_row_python_udf_anywhere(plans):
    """Arrow-batched Python (ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas) is the sanctioned escape hatch; row-at-a-time
    BatchEvalPython is never acceptable."""
    hits = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not hits, f"row-at-a-time Python UDF in: {hits}"


def test_bnl_only_where_designed(plans):
    hits = {n for n, p in plans.items() if "BroadcastNestedLoopJoin" in p}
    unexpected = hits - BNL_BY_DESIGN
    vanished = BNL_BY_DESIGN - set(QUERIES)
    assert not unexpected, (
        f"unreviewed BroadcastNestedLoopJoin in: {sorted(unexpected)} — "
        f"either bound the broadcast side and add it to BNL_BY_DESIGN, "
        f"or give the join an equi/bin key"
    )
    assert not vanished, f"BNL_BY_DESIGN names unknown queries: {vanished}"
