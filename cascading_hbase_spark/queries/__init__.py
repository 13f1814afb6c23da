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
    # r12: reset to [] at round start (the r11 verdicts landed; the
    # derived head is now the 28 r05-dated + 22 oldest r07-dated pairs
    # per VERDICT r11 item 3).  Names are added below ONLY as their
    # query/oracle code changes this round.
    #
    # r12: NEW pair — the STREAMING MIN/MAX MATVIEW (growth seam,
    # VERDICT r11 item 6): stream_matview with mins/maxs, extremum
    # retraction rescans pinned to each batch's WAL'd end offset,
    # view-vs-first-principles oracle in exact BIGINT cents.
    "streaming_matview_minmax",
    # r12: NEW pair — changefeed ACROSS a re-bucketing compaction
    # (VERDICT r11 item 1, keyed/cdc_prune.py): the pruned diff vs a
    # first-principles oracle; a skipped touched range or asymmetric
    # per-side coverage fails the hash.
    "changefeed_across_rebucket",
    # r12: NEW pair — STREAMING SECONDARY INDEX (stream_index, the
    # third streaming CDC consumer): stream-maintained index lookup
    # vs a full-scan first-principles oracle over a mixed
    # insert/value-move/silent-update/delete wave.
    "streaming_index_lookup",
    # r12: NEW pair — secondary-index RANGE lookup through the
    # order-preserving composite-key encoding (keyed/index.py v2:
    # integrals as lpad(v + 2^63, 20, '0'), the OrderedBytes pattern);
    # BETWEEN over an indexed BIGINT = one bucket-pruned index range
    # scan, maintained incrementally across a mixed wave first.
    "index_range_lookup",
    # r12: NEW pair — COVERING index lookup (include columns stored
    # in-row, fields served INDEX-ONLY); the oracle pins that
    # include-column-only updates refresh the covered payload.
    "index_covering_lookup",
    # r12: CHANGED pair — index_incremental_lookup's engine path now
    # writes v2-encoded composite keys (same query/oracle code, but
    # the standing rule is about the pair's MEANING: its evidence
    # must be re-earned the round its engine semantics change).
    "index_incremental_lookup",
    # r12: CHANGED pair — streaming_index_lookup's engine path
    # likewise (stream_index stamps enc/include and encodes keys v2).
    # Already listed above as a new r12 pair.
    #
    # r12: NEW pair — COMPOSITE index (create_index(path, [a, b])):
    # equality on the leading column + range on the next as one
    # contiguous encoded-key scan, served index-only, maintained
    # incrementally with per-component move retraction.
    "index_composite_lookup",
    # r12: NEW pair — cross-table SAVEPOINT/RESTORE (keyed/txn.py):
    # a consistent {table: version} cut under all writer leases,
    # restored as ONE atomic multi_commit of per-table rollbacks;
    # the oracle recomputes the pre-mutation join from first
    # principles, so a half-restored group fails the hash.
    "savepoint_restore_roundtrip",
    # r12: NEW pair — persisted column statistics (keyed/stats.py,
    # ANALYZE TABLE): one-scan per-column counts/NDV/min-max stamped
    # into the manifest meta-only; the oracle recomputes every number
    # from first principles.
    "analyze_column_stats",
    # r12: NEW pair — IN-list lookup through the index (one pruned
    # range scan per distinct probe, unioned; duplicates deduped).
    "index_in_list_lookup",
    # r12: NEW pair — persisted HEAVY-HITTER stats (analyze_keyed
    # heavy_hitters=K, total-ordered top-K per column) — the measured
    # input suggest_salt_factor turns into a salt factor.
    "analyze_heavy_hitters",
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
