"""Scalable global row enumeration (SURVEY.md §2.5 ordering surface).

``global_row_index`` assigns contiguous 0..N-1 indices in a total key
order — the DataFrame replacement for RDD ``zipWithIndex`` and for the
single-partition trap ``row_number() OVER (ORDER BY ...)`` (a global
window with no PARTITION BY moves ALL rows to one task; at 100 TB that
is the whole dataset on one executor).

The scale shape is the equi-depth-histogram pattern:

1. ONE exact-percentile aggregate computes B-1 key cut points
   (partial+final, #cuts rows back to the driver side of the plan —
   never the data).
2. Rows map-side bucket themselves by counting cuts below their key.
3. Per-bucket counts (B rows) prefix-sum into bucket offsets via a
   window over the B-row relation — trivially small.
4. ``row_number()`` runs PARTITIONED BY bucket — B parallel windows of
   ~N/B rows each — and adds the broadcast bucket offset.

Every stage is a shuffle on the bucket key or a broadcast of B rows;
no stage ever holds more than ~N/B rows in one task.  Requires a
UNIQUE numeric/orderable key (enforced: ties across bucket boundaries
would make indices ambiguous anyway)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = [
    "global_row_index",
    "bucketed_running_sum",
    "bucketed_running_max",
    "grouped_running_sum",
]


# Internal working columns the helpers join/select alongside the
# caller's columns; an input already containing one would silently
# collide (ambiguous join keys, wrong drops) rather than error.
# Deliberately ONE uniform set for all four helpers (not a per-helper
# subset): a name only some helper uses today may be adopted by
# another tomorrow, and "rename _offset" is a cheaper contract than
# "which helper am I calling".
_RESERVED_COLS = ("_bucket", "_cs", "_offset", "_base", "_g", "_b")


def _check_reserved(df: DataFrame) -> None:
    clash = [c for c in df.columns if c in _RESERVED_COLS]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with the enumerate helpers' "
            f"reserved internal names {_RESERVED_COLS}; rename them first"
        )


def _percentile_buckets(
    df: DataFrame, key_col: str, n_buckets: int, descending: bool = False
) -> DataFrame:
    """Shared bucket-decomposition step: ``df`` plus ``_bucket`` (int,
    ascending in the key — or descending when asked), assigned by an
    exact-percentile cut aggregate broadcast back and a map-side
    monotone count-of-cuts-below fold.  Equal keys always get equal
    buckets; ANY cut quality yields a correct (merely unbalanced)
    decomposition, because the consumers only require monotonicity."""
    _check_reserved(df)
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    qs = ", ".join(
        f"{(i + 1) / (n_buckets):.10f}D" for i in range(n_buckets - 1)
    )
    # approx_percentile, not percentile: consumers only need MONOTONE
    # cuts (any quality gives a correct, merely unbalanced,
    # decomposition — asserted by the fuzz tests, which cover
    # degenerate cuts), and the exact variant builds a full value
    # map per partition (~14x slower on a 6M-row key at sf1).  The
    # t-digest's cuts are deterministic for a fixed input, so plans
    # and results stay reproducible.
    cuts = df.agg(
        F.expr(
            f"approx_percentile(cast({key_col} as double), array({qs}), 1000)"
        ).alias("_cs")
        if n_buckets > 1
        else F.expr("array(cast(null as double))").alias("_cs")
    )
    asc = (
        F.aggregate(
            "_cs",
            F.lit(0),
            lambda acc, c: acc
            + F.when(F.col(key_col).cast("double") > c, 1).otherwise(0),
        )
        if n_buckets > 1
        else F.lit(0)
    )
    bucket = (F.lit(n_buckets - 1) - asc) if descending else asc
    return df.join(F.broadcast(cuts)).select(
        df["*"], bucket.alias("_bucket")
    )


def global_row_index(
    df: DataFrame,
    key_col: str,
    index_col: str = "row_index",
    n_buckets: int = 32,
) -> DataFrame:
    """Add ``index_col``: the 0-based rank of ``key_col`` in the total
    ascending order, contiguous across the whole relation.

    ``n_buckets`` bounds per-task window size (~N/n_buckets rows); at
    cluster scale set it to O(cores).  Deterministic for unique keys
    (duplicate keys raise at percentile-cut collision points only by
    luck — callers must pass a unique key)."""
    bucketed = _percentile_buckets(df, key_col, n_buckets)
    # B-row prefix sum: offset(b) = total rows in buckets < b.
    offsets = (
        bucketed.groupBy("_bucket")
        .agg(F.count("*").alias("_n"))
        .select(
            "_bucket",
            (
                F.sum("_n").over(
                    Window.orderBy("_bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                )
            ).alias("_offset"),
        )
        .fillna({"_offset": 0})
    )
    w = Window.partitionBy("_bucket").orderBy(key_col)
    return (
        bucketed.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            index_col,
            (F.row_number().over(w) - 1 + F.col("_offset")).cast("bigint"),
        )
        .drop("_bucket", "_cs", "_offset")
    )


def bucketed_running_sum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    sum_col: str = "running_sum",
    descending: bool = False,
    n_buckets: int = 32,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Global running sum of ``value_col`` in ``key_col`` order —
    ``SUM(v) OVER (ORDER BY key)`` without the single-partition global
    window, via the same bucket decomposition as ``global_row_index``:

    1. percentile cuts on the key -> map-side bucket (monotone, so any
       cut quality is correct),
    2. per-bucket value TOTALS (B rows) prefix-sum into bucket base
       offsets,
    3. the running sum windows PARTITION BY bucket and adds the base.

    ``value_col`` should be an exact type (DECIMAL/integer): the bucket
    base is added to every row of the bucket, so float rounding would
    differ from the single-window formulation; exact types make the
    decomposition literally equal to it.  Equal keys always land in the
    same bucket (bucketing is a function of the key), so a
    ``tiebreak_col`` gives ties a deterministic running order; without
    one the key must be unique."""
    bucketed = _percentile_buckets(df, key_col, n_buckets, descending)
    bases = (
        bucketed.groupBy("_bucket")
        .agg(F.sum(value_col).alias("_bt"))
        .select(
            "_bucket",
            F.coalesce(
                F.sum("_bt").over(
                    Window.orderBy("_bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("_base"),
        )
    )
    order = [F.col(key_col).desc() if descending else F.col(key_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = (
        Window.partitionBy("_bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(bases), "_bucket")
        .withColumn(sum_col, F.sum(value_col).over(w) + F.col("_base"))
        .drop("_bucket", "_cs", "_base")
    )


def bucketed_running_max(
    df: DataFrame,
    key_col: str,
    value_col: str,
    max_col: str = "running_max",
    strict: bool = False,
    n_buckets: int = 32,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Global running max of ``value_col`` in ``key_col`` order —
    ``MAX(v) OVER (ORDER BY key)`` without the single-partition global
    window, via the same bucket decomposition as
    ``bucketed_running_sum`` (cuts broadcast, per-bucket windows, B-row
    exclusive prefix over the bucket maxima).

    ``strict=True`` returns the max over STRICTLY PRECEDING rows (NULL
    for the global first row) — the form skyline/Pareto-frontier
    pruning needs.  Max is reorder-safe, so unlike the running sum
    there is no exact-type caveat; keys may tie if a ``tiebreak_col``
    fixes the order (ties still see each other's values under
    ``strict`` according to that order)."""
    bucketed = _percentile_buckets(df, key_col, n_buckets)
    bases = (
        bucketed.groupBy("_bucket")
        .agg(F.max(value_col).alias("_bm"))
        .select(
            "_bucket",
            F.max("_bm")
            .over(
                Window.orderBy("_bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
            .alias("_base"),
        )
    )
    order = [F.col(key_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    upper = -1 if strict else Window.currentRow
    w = (
        Window.partitionBy("_bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    # greatest() skips NULLs, so a NULL within-bucket prefix (first row
    # of the bucket under strict) falls back to the base alone, and a
    # NULL base (bucket 0) to the within-bucket prefix alone; only the
    # global first row under strict stays NULL.
    return (
        bucketed.join(F.broadcast(bases), "_bucket")
        .withColumn(
            max_col, F.greatest(F.max(value_col).over(w), F.col("_base"))
        )
        .drop("_bucket", "_cs", "_base")
    )


def grouped_running_sum(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str,
    sum_col: str = "running_sum",
    descending: bool = False,
    n_buckets: int = 32,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-group running sum of ``value_col`` in ``key_col`` order —
    ``SUM(v) OVER (PARTITION BY g ORDER BY key)`` for groups too large
    for a single task, via the same bucket decomposition as
    ``bucketed_running_sum`` but with PER-GROUP percentile cuts:

    1. one ``approx_percentile`` aggregate per group (a #groups-row
       relation) joined back on the group key,
    2. map-side bucket from count-of-cuts-below (monotone within the
       group; any cut quality is correct),
    3. per-(group, bucket) totals prefix-summed over each group's B-row
       spine,
    4. the running window partitions by (group, bucket) — never by the
       group alone.

    When every group comfortably fits one task, a plain
    ``PARTITION BY group`` window is simpler and cheaper — this is the
    escape hatch for the 100 TB case where ONE group is a large
    fraction of the data (the aggregation-skew shape from
    ``functions/skew.py``, applied to windows).  Same exact-type caveat
    and tie rules as ``bucketed_running_sum``; ``key_col`` must be
    non-null.  NULL groups are kept and treated as one group, exactly
    like ``PARTITION BY`` (the joins below are null-safe).

    Join strategy note: the cuts/bases joins are deliberately NOT
    broadcast-hinted — #groups scales with the data (a hint would OOM
    at millions of groups), Catalyst broadcasts small cut relations by
    size estimate anyway, and a hot group at the join stage is JOIN
    skew, which the session's AQE skew-join splitter handles per the
    ``functions/skew.py`` policy."""
    _check_reserved(df)
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    qs = ", ".join(
        f"{(i + 1) / (n_buckets):.10f}D" for i in range(n_buckets - 1)
    )
    cuts = df.groupBy(group_col).agg(
        F.expr(
            f"approx_percentile(cast({key_col} as double), array({qs}), 1000)"
        ).alias("_cs")
        if n_buckets > 1
        else F.expr("array(cast(null as double))").alias("_cs")
    )
    asc = (
        F.aggregate(
            "_cs",
            F.lit(0),
            lambda acc, c: acc
            + F.when(F.col(key_col).cast("double") > c, 1).otherwise(0),
        )
        if n_buckets > 1
        else F.lit(0)
    )
    bucket = (F.lit(n_buckets - 1) - asc) if descending else asc
    # null-safe group join: PARTITION BY treats NULL as its own group,
    # so the decomposition must too (an inner equi-join would silently
    # drop NULL-group rows)
    cuts = cuts.withColumnRenamed(group_col, "_g")
    bucketed = df.join(
        cuts, F.col(group_col).eqNullSafe(F.col("_g"))
    ).select(df["*"], bucket.alias("_bucket"))
    bases = (
        bucketed.groupBy(group_col, "_bucket")
        .agg(F.sum(value_col).alias("_bt"))
        .select(
            F.col(group_col).alias("_g"),
            F.col("_bucket").alias("_b"),
            F.coalesce(
                F.sum("_bt").over(
                    Window.partitionBy(group_col)
                    .orderBy("_bucket")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("_base"),
        )
    )
    order = [F.col(key_col).desc() if descending else F.col(key_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = (
        Window.partitionBy(group_col, "_bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(
            bases,
            F.col(group_col).eqNullSafe(F.col("_g"))
            & (F.col("_bucket") == F.col("_b")),
        )
        .withColumn(sum_col, F.sum(value_col).over(w) + F.col("_base"))
        .drop("_bucket", "_cs", "_base", "_g", "_b")
    )
