"""Persisted column statistics for keyed tables — the ANALYZE TABLE
story.  The reference delegates statistics entirely to HBase's region
metadata (split points are the only stats the 629-LoC connector ever
consults, TableInputFormatWrap.java:46-66); an engine that plans its
own skew handling, salting factors, and broadcast decisions needs real
column stats, computed once and persisted where every later planner
call can read them without re-scanning 100 TB.

``analyze_keyed`` computes, in ONE full-scan aggregate job (map-side
partial aggregation; no per-column passes):

- ``n_nonnull`` / ``n_null`` per column,
- ``n_distinct`` — ``approx_count_distinct`` (HLL, default rsd 5%) by
  default; ``exact=True`` switches to exact distinct counts (one
  expand-aggregate — fine at test SFs, expensive at 100 TB, which is
  the point of the default),
- ``min`` / ``max`` (stored in string form, schema-stable) for atomic
  orderable types; complex/binary columns get counts only,

and stamps the result into the table manifest as a META-ONLY commit
(the ``set_ttl`` pattern: versioned, history-snapshotted, atomic) under
``stats = {"version": <analyzed snapshot>, "row_count": N,
"columns": {...}}``.  The stamp records WHICH snapshot was analyzed —
consumers (`table_stats`) see both the stats and their age and decide
staleness policy themselves; `analyze_keyed` of an unchanged snapshot
is a no-op (no empty commit).

``column_stats`` surfaces the persisted stats as a DataFrame (one row
per column) without touching data — the observability twin of
``describe_keyed``'s per-bucket view.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from cascading_hbase_spark.keyed.table import (
    _gc_orphans,
    _load_meta,
    _save_meta,
    _write_history,
    _writer_lock,
    read_keyed,
)

__all__ = [
    "StaleStatsError", "analyze_keyed", "broadcast_advice", "column_stats",
    "estimated_row_bytes", "stats_hinted_join", "suggest_salt_factor",
    "table_stats",
]


class StaleStatsError(RuntimeError):
    """Raised by stats consumers under ``require_fresh=True`` when a
    DATA commit landed after the analyzed snapshot (``data_changed``)."""


def _data_fingerprint(meta: dict) -> str:
    """Identity of the VISIBLE DATA, not the manifest version: the
    per-bucket generation pointers + boundaries + the TTL policy.
    Meta-only commits (set_ttl aside, e.g. maintenance stamps and the
    stats commit ITSELF) keep it stable, so the no-op check survives
    its own commit; any data commit moves a pointer and changes it.
    TTL tables drift with the wall clock regardless — re-analyze on a
    schedule there."""
    import hashlib
    import json as _json

    basis = {
        "gens": dict(sorted(meta.get("gens", {}).items())),
        "boundaries": [str(b) for b in meta.get("boundaries", [])],
        "ttl": meta.get("ttl"),
    }
    return hashlib.sha256(
        _json.dumps(basis, sort_keys=True).encode()
    ).hexdigest()[:16]

_ATOMIC = (
    StringType, BooleanType, ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType, DecimalType, DateType, TimestampType,
    TimestampNTZType,
)


def _heavy_hitters_df(df: DataFrame, cols: list[str], k: int) -> DataFrame:
    """Top-``k`` values per column, from ONE scan of ``df`` regardless
    of ``len(cols)``: every row explodes map-side into one ``(col,
    value)`` pair per analyzed column (nulls dropped — not-a-value),
    one map-side-combined groupBy counts the pairs, and one window
    ranks each column's distincts under the TOTAL order (count desc,
    value asc — ties never make the stored list engine-dependent).
    Returns ``(col, v, count)`` ordered by (col, rank)."""
    from pyspark.sql import Window

    pairs = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("col"),
                    F.col(c).cast("string").alias("v"),
                )
                for c in cols
            ])
        ).alias("p")
    ).select("p.col", "p.v").filter(F.col("v").isNotNull())
    counts = pairs.groupBy("col", "v").count()
    rn = F.row_number().over(
        Window.partitionBy("col").orderBy(F.desc("count"), F.asc("v"))
    )
    return (
        counts.withColumn("_rn", rn)
        .filter(F.col("_rn") <= k)
        .orderBy("col", "_rn")
        .drop("_rn")
    )


def analyze_keyed(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    exact: bool = False,
    heavy_hitters: int = 0,
) -> None:
    """Compute and persist column statistics for the CURRENT snapshot.

    One aggregate job over the pinned snapshot; the stamp rides a
    meta-only commit.  Re-analyzing an unchanged, already-analyzed
    snapshot with the same configuration is a no-op.

    ``heavy_hitters=K`` additionally records each analyzed ATOMIC
    column's top-K values by frequency — in ONE job over ONE table
    scan regardless of column count (r13; the r12 cut re-scanned the
    table once per column, a real multiplier at 100 TB): the columns
    explode to ``(col, value)`` pairs map-side, one map-side-combined
    groupBy counts them (a skewed column by definition concentrates
    its mass in few keys, so the partials stay small even at 100 TB),
    and one per-column top-K window ranks the counted distincts (the
    bounded-memory Misra-Gries variant lives in ``queries/skew.py``
    for when even the distinct-key set is hostile).  Heavy hitters are
    what ``suggest_salt_factor`` and broadcast-vs-shuffle decisions
    consult."""
    meta = _load_meta(path)
    version = meta["version"]
    df = read_keyed(spark, path, generation=version)
    columns = list(columns) if columns is not None else list(df.columns)
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"analyze columns not in table: {missing}")
    fp = _data_fingerprint(meta)
    prior = meta.get("stats")
    if (
        prior is not None
        and prior.get("fingerprint") == fp
        and set(prior.get("columns", {})) == set(columns)
        and prior.get("exact", False) == exact
        and prior.get("heavy_hitters", 0) == heavy_hitters
    ):
        return  # stats for this exact data snapshot already stamped

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(columns):
        col = F.col(c)
        aggs.append(F.count(col).alias(f"nn_{i}"))
        aggs.append(
            (F.count_distinct(col) if exact
             else F.approx_count_distinct(col)).alias(f"nd_{i}")
        )
        if isinstance(df.schema[c].dataType, _ATOMIC):
            aggs.append(F.min(col).cast("string").alias(f"mn_{i}"))
            aggs.append(F.max(col).cast("string").alias(f"mx_{i}"))
    row = df.agg(*aggs).collect()[0].asDict()

    n = int(row["__n"])
    hh_by_col: dict[str, list] = {}
    if heavy_hitters > 0:
        hh_cols = [
            c for c in columns if isinstance(df.schema[c].dataType, _ATOMIC)
        ]
        if hh_cols:
            for r in _heavy_hitters_df(df, hh_cols, heavy_hitters).collect():
                hh_by_col.setdefault(r.col, []).append(
                    {"value": r.v, "count": int(r["count"])}
                )
            for c in hh_cols:  # all-null columns still record []
                hh_by_col.setdefault(c, [])
    cols_out = {}
    for i, c in enumerate(columns):
        ent = {
            "n_nonnull": int(row[f"nn_{i}"]),
            "n_null": n - int(row[f"nn_{i}"]),
            "n_distinct": int(row[f"nd_{i}"]),
        }
        if f"mn_{i}" in row:
            ent["min"] = row[f"mn_{i}"]
            ent["max"] = row[f"mx_{i}"]
        if c in hh_by_col:
            ent["heavy_hitters"] = hh_by_col[c]
        cols_out[c] = ent

    with _writer_lock(path):
        cur = _load_meta(path)
        # stamp names the ANALYZED snapshot even if the table moved
        # between the scan and this commit — consumers compare it to
        # the current version and see exactly how stale the stats are
        cur["stats"] = {
            "version": version,
            "fingerprint": fp,
            "exact": exact,
            "heavy_hitters": heavy_hitters,
            "row_count": n,
            "columns": cols_out,
        }
        cur["version"] = cur.get("version", 1) + 1
        _save_meta(path, cur)
        _write_history(path, cur)
        _gc_orphans(path, cur)


def table_stats(path: str) -> dict:
    """The persisted stats document plus ``current_version`` (the
    table's live version, for staleness accounting: the stats commit
    itself bumps the version, so freshly-analyzed stats read
    ``current_version == stats["version"] + 1``).  Raises KeyError if
    the table was never analyzed."""
    meta = _load_meta(path)
    st = meta.get("stats")
    if st is None:
        raise KeyError(f"keyed table {path} has no stats; analyze_keyed first")
    return {
        **st,
        "current_version": meta["version"],
        # True when a DATA commit landed after the analysis (meta-only
        # commits keep the fingerprint stable) — the staleness signal
        # consumers act on
        "data_changed": _data_fingerprint(meta) != st.get("fingerprint"),
    }


def suggest_salt_factor(
    path: str,
    col: str,
    partitions: int = 200,
    cap: int = 64,
    require_fresh: bool = False,
) -> int:
    """A salt factor for joins/aggs keyed on ``col``, derived from the
    PERSISTED heavy hitters (``analyze_keyed(heavy_hitters=K)``
    first): the hottest key's rows would all land in one reduce task,
    so split it across ``ceil(top_share * partitions)`` salts — 1
    (no salting) when the hottest key is no bigger than a balanced
    partition's share, capped at ``cap`` (each salt multiplies the
    build side of a salted join).  This is the number
    ``functions/skew.py``'s salted operators take as their explicit
    factor — derived from measured stats instead of guessed.

    Raises KeyError when the table was never analyzed or the column
    has no heavy-hitter stats (counts-only analysis).  STALE stats
    (a data commit after the analysis) still resolve by default — a
    salt factor from old stats is merely suboptimal, never wrong (any
    factor yields identical results) — pass ``require_fresh=True`` to
    get ``StaleStatsError`` instead when the workload's skew drifts."""
    import math

    st = table_stats(path)
    if require_fresh and st.get("data_changed"):
        raise StaleStatsError(
            f"stats for {path} predate the latest data commit "
            f"(analyzed v{st['version']}, now v{st['current_version']}); "
            f"re-run analyze_keyed"
        )
    ent = st["columns"].get(col)
    if ent is None or "heavy_hitters" not in ent:
        raise KeyError(
            f"no heavy-hitter stats for {col!r}; run "
            f"analyze_keyed(..., columns=[{col!r}], heavy_hitters=K)"
        )
    hh = ent["heavy_hitters"]
    total = st["row_count"]
    if not hh or not total:
        return 1
    top_share = hh[0]["count"] / total
    return max(1, min(cap, math.ceil(top_share * partitions)))


def estimated_row_bytes(stats: dict) -> int:
    """A defensible in-memory row-width estimate from the persisted
    stats alone (no data read): per column, the average of the stored
    min/max STRING forms' lengths (the only width evidence the stats
    carry) plus per-field overhead; columns without min/max (complex/
    binary — width unknowable from counts) charge a conservative 64
    bytes.  Used by ``broadcast_advice`` as rows x width vs the
    broadcast budget — an ESTIMATE for a go/no-go decision, not an
    accounting of Tungsten's exact layout."""
    total = 0
    for ent in stats["columns"].values():
        if "min" in ent and ent["min"] is not None:
            total += (len(str(ent["min"])) + len(str(ent["max"]))) // 2 + 8
        else:
            total += 64
    return max(total, 8)


def broadcast_advice(
    path: str,
    max_bytes: int | None = None,
    require_fresh: bool = False,
) -> bool:
    """Should a join build side read from this keyed table be
    BROADCAST?  Decided from the PERSISTED stats (``analyze_keyed``
    first — raises KeyError when never analyzed): estimated bytes =
    ``row_count x estimated_row_bytes`` under ``max_bytes`` (default:
    the session-independent 10 MiB, Spark's own
    ``autoBroadcastJoinThreshold`` default) says broadcast.

    The staleness rule is CONSERVATIVE in the direction that cannot
    OOM a cluster: when a data commit landed after the analysis
    (``data_changed``) the dim may have grown unboundedly since, so
    the advice is False (shuffle — always correct, never fatal) unless
    the caller asked to fail loud instead (``require_fresh=True`` ->
    ``StaleStatsError``).  A stale-stats SALT decision only costs
    balance; a stale-stats broadcast decision can kill executors —
    hence the asymmetry with ``suggest_salt_factor``."""
    st = table_stats(path)
    if st.get("data_changed"):
        if require_fresh:
            raise StaleStatsError(
                f"stats for {path} predate the latest data commit "
                f"(analyzed v{st['version']}, now v{st['current_version']}); "
                f"re-run analyze_keyed"
            )
        return False
    budget = 10 * 1024 * 1024 if max_bytes is None else max_bytes
    return st["row_count"] * estimated_row_bytes(st) <= budget


def stats_hinted_join(
    spark: SparkSession,
    fact: DataFrame,
    dim_path: str,
    on: list[str] | str,
    how: str = "inner",
    max_bytes: int | None = None,
) -> DataFrame:
    """Join ``fact`` against a keyed DIM table with the broadcast
    decision taken from the dim's PERSISTED stats at plan time — the
    reference's own planning story (it consults the server's region
    metadata to plan splits, TableInputFormatWrap.java:46-66) promoted
    to the join: ``analyze_keyed`` once, and every later join against
    the dim plans itself without re-scanning or guessing.

    ``broadcast_advice`` True -> an explicit ``F.broadcast`` hint (the
    map-side join, zero shuffle of the fact side); False (big dim,
    never-analyzed stays an error, STALE stats conservatively shuffle)
    -> unhinted, letting AQE pick from runtime sizes.  Either branch
    returns identical rows; only the physical plan moves."""
    dim = read_keyed(spark, dim_path)
    if broadcast_advice(dim_path, max_bytes=max_bytes):
        dim = F.broadcast(dim)
    return fact.join(dim, on=on, how=how)


def column_stats(spark: SparkSession, path: str) -> DataFrame:
    """Persisted stats as one row per column — metadata only, no data
    read.  ``min``/``max`` are the stored string forms (NULL for
    complex/binary columns)."""
    st = table_stats(path)
    rows = [
        (
            c,
            ent["n_nonnull"],
            ent["n_null"],
            ent["n_distinct"],
            ent.get("min"),
            ent.get("max"),
        )
        for c, ent in sorted(st["columns"].items())
    ]
    return spark.createDataFrame(
        rows,
        "column string, n_nonnull bigint, n_null bigint, "
        "n_distinct bigint, min string, max string",
    )
