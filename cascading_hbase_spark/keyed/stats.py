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
    "analyze_keyed", "column_stats", "suggest_salt_factor", "table_stats",
]


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
    column's top-K values by frequency — one groupBy per column
    (map-side combine crushes the shuffle: a skewed column by
    definition concentrates its mass in few keys, so the partial
    aggregates are small even at 100 TB; the bounded-memory
    Misra-Gries variant lives in ``queries/skew.py`` for when even
    the distinct-key set is hostile).  Heavy hitters are what
    ``suggest_salt_factor`` and broadcast-vs-shuffle decisions
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
        if heavy_hitters > 0 and isinstance(df.schema[c].dataType, _ATOMIC):
            col = F.col(c)
            top = (
                df.filter(col.isNotNull())
                .groupBy(col.cast("string").alias("v"))
                .count()
                # total order: count desc, value asc — ties never make
                # the stored list engine-dependent
                .orderBy(F.desc("count"), F.asc("v"))
                .limit(heavy_hitters)
                .collect()
            )
            ent["heavy_hitters"] = [
                {"value": r.v, "count": int(r["count"])} for r in top
            ]
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
    path: str, col: str, partitions: int = 200, cap: int = 64
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
    has no heavy-hitter stats (counts-only analysis); raises nothing
    on STALE stats — check ``table_stats(path)["data_changed"]``
    upstream if staleness matters for the workload."""
    import math

    st = table_stats(path)
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
