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


# --- Driver verification order -------------------------------------
#
# The driver's per-round correctness budget checks the FIRST ~50
# entries of ``queries()``.  Rounds 6-7 proved a hand-maintained
# priority list rots (the r07 budget re-verified 50 already-green
# pairs because the list was not rotated), so the order is now DERIVED
# from the committed ``CORRECTNESS_r*.json`` artifacts at import time
# (VERDICT r07 item 1):
#
#   1. ``_CHANGED_THIS_ROUND`` — pairs whose query/oracle code changed
#      this round (standing rule: a changed pair must re-verify the
#      same round it changes).
#   2. never-driver-verified pairs, registration order.
#   3. everything else, stalest newest-verdict first (testdata
#      regenerates per round, so verdict age is the weakest link in
#      the CORRECTNESS evidence), registration order as tiebreak.
#
# The rotation is therefore automatic: when a round's verdicts land,
# the pairs it verified sink to the tail and the next-stalest 50 rise
# to the head.  ``tools/rotate_priority.py`` prints the derived head
# and regenerates ``tests/verdict_backlog.txt`` to match.

# Pairs changed or added THIS round (round 9: reset to empty at round
# start per the standing rule — the r08 verdicts landed, so the r08
# hand-list would only burn driver slots re-verifying r08-green pairs.
# Add a name here ONLY when its query/oracle code changes this round;
# ``tools/round_end_check.py`` cross-checks this list against
# ``git diff`` so a stale entry fails the round-end gate.)
_CHANGED_THIS_ROUND: list[str] = [
    # r13: reset to [] at round start (the r12 verdicts landed; the
    # derived head is now the 38 r07-dated + 12 oldest r08-dated
    # pairs per VERDICT r12 item 4).  Names are added below ONLY as
    # their query/oracle code changes this round.
    #
    # r13: NEW pair — index RANGE lookup over a DECIMAL money column
    # (the v4 order-preserving unscaled-integer encoding, VERDICT r12
    # item 6).
    "index_range_lookup_decimal",
    # r13: NEW pair — index RANGE lookup over a TIMESTAMP column (v4
    # unix-micros instant encoding: session-timezone-independent and
    # DST-fold-monotone, closing the r12 ADVICE medium item).
    "index_range_lookup_timestamp",
    # r13: CHANGED pairs — the key-encoding bump to v4 changes the
    # stored composite keys EVERY index pair's engine path writes
    # (standing rule: evidence is re-earned the round the engine
    # semantics under a pair change).
    "index_incremental_lookup",
    "index_range_lookup",
    "index_covering_lookup",
    "index_composite_lookup",
    "index_in_list_lookup",
    "streaming_index_lookup",
    # r13: NEW pair — stats-driven salting as the DEFAULT planning
    # path (VERDICT r12 item 1): salted_two_phase_agg(n_salt="auto")
    # resolves the factor from analyze_keyed's persisted heavy
    # hitters; plan flip asserted in tests/test_stats.py.
    "auto_salted_agg",
    # r13: NEW pair — stats-driven broadcast decision: a keyed dim's
    # persisted row-count/width stats pick F.broadcast at plan time,
    # stale stats conservatively shuffle.
    "stats_broadcast_join",
    # r13: CHANGED pair — savepoint_keyed now REGISTERS its cut in
    # every covered table (retention-aware savepoints: GC/history
    # pruning pin the covered snapshots, vacuum refuses to cross a
    # live savepoint, expiry collects) — the pair's engine path
    # changed, so its evidence is re-earned this round.
    "savepoint_restore_roundtrip",
    # r13: CHANGED pair — analyze_keyed's heavy-hitter pass now runs
    # as ONE job over ONE scan for all columns (explode + one groupBy
    # + one per-column top-K window) instead of a groupBy per column;
    # same stored lists, different engine path.
    "analyze_heavy_hitters",
    # r13: NEW pair — stats-driven ACCESS-PATH choice (index vs
    # zone-pruned scan for a range predicate, decided from persisted
    # stats at plan time); the query self-asserts each branch's
    # physical path via inputFiles(), so the driver verdict covers
    # the plan flip.
    "auto_range_lookup",
    # r13: NEW pair — PER-VALUE equality access-path choice: a probe
    # that IS a measured heavy hitter plans from its exact count
    # (scan), cold values from the residual average (index); both
    # branches self-asserted via inputFiles().
    "auto_point_lookup",
    # r13: NEW pair — histogram-backed range selectivity: persisted
    # equi-width bin counts price a wide-width/thin-mass tail range
    # at its measured ~5% and flip the plan from scan to index; both
    # advisories and the served path self-asserted.
    "histogram_range_selectivity",
    # r13: NEW pair — IN-list access-path choice (the third member of
    # the auto family): summed per-value estimates tip a hot list to
    # the scan and a cold list to the index; both self-asserted.
    "auto_in_list_lookup",
    # r13 OPTIMIZATION phase: CHANGED pairs — plan restructures
    # (row-identical, each already 3-SF oracle-rehearsed this round;
    # listed so the driver re-earns their evidence same-round per the
    # standing rule).  Details in OPTIMIZATION_r13.md.
    "substring_dup_spans",       # single tokenize + window, no join-back
    "q21_suppliers_kept_waiting",  # one lineitem pass, window stats
    "cms_frequency_contract",    # sketch cells from the vocabulary agg
    "bm25_topk",                 # hits filtered inside the token array
    "pmi_collocations",          # marginals/total from the bigram model
    # r13 OPTIMIZATION phase: the co-purchase pin switched from
    # persist to eager localCheckpoint (plan-size cut) — the engine
    # path under every pin consumer changed, so their evidence is
    # re-earned too.
    "copurchase_triangles",
    "copurchase_triangles_capped",
    "copurchase_triangles_estimate",
    "triangle_cap_audit",
    "triangle_estimate_audit",
    "copurchase_degree_distribution",
    "itemcf_recommendations",
    "graph_bfs_hops",
    "copurchase_link_prediction_recall",
]

# Number of head entries the driver's per-round budget is known to
# reach (CORRECTNESS_r06/r07 both contained exactly the first 50).
DRIVER_BUDGET = 50


def _verdict_rounds() -> dict[str, int]:
    """name -> newest driver round with a verdict, read from the
    committed ``CORRECTNESS_r*.json`` artifacts at the repo root.
    Every name in a file counts (pass or fail — presence means the
    driver produced a verdict that round)."""
    import glob
    import json
    import os

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
    newest: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
            with open(path) as f:
                names = [n for n in json.load(f) if isinstance(n, str)]
        except Exception:
            # malformed artifact (unreadable, bad JSON, or a shape whose
            # iteration/keys aren't strings): ignore — this runs at
            # import, and a bad driver file must never break the package
            continue
        for name in names:
            newest[name] = max(newest.get(name, 0), rnd)
    return newest


def driver_order() -> list[str]:
    """The verification order ``queries()`` exposes: changed-this-round
    first, then never-verified, then stalest-verdict-first."""
    newest = _verdict_rounds()
    reg = list(QUERIES)
    idx = {k: i for i, k in enumerate(reg)}
    head = [k for k in _CHANGED_THIS_ROUND if k in QUERIES]
    seen = set(head)
    rest = sorted(
        (k for k in reg if k not in seen),
        key=lambda k: (newest.get(k, -1), idx[k]),
    )
    return head + rest


def _reorder() -> None:
    order = driver_order()
    for d in (QUERIES, ORACLES):
        snap = dict(d)
        d.clear()
        d.update({k: snap[k] for k in order if k in snap})


_load_all()
_reorder()
