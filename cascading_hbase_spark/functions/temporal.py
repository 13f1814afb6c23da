"""Temporal operators: generic as-of join.

Spark has no native as-of join; the engine expresses it as a
union-and-carry-forward: both sides merge into one keyed timeline, a
single ordered window carries the right side's latest value forward,
and left rows are filtered back out.  ONE shuffle on the join key —
never the correlated-subquery N² the naive SQL formulation implies
(that formulation is kept as the independent DuckDB oracle in
``queries/events.py``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql import types as T

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts: str,
    value_cols: list[str] | None = None,
    tolerance: str | int | float | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the nearest right row's ``value_cols``
    for the same ``on`` key(s).

    ``direction='backward'`` (default) takes the most recent right row
    at-or-before the left ``ts``; ``'forward'`` takes the earliest
    at-or-after.  Ties at equal ``ts`` resolve to the right row
    (at-or-before/after includes 'at').  ``tolerance`` (a SQL interval
    body, e.g. ``'30 days'``) nulls out matches further than that from
    the left ``ts`` — the pandas ``merge_asof(tolerance=...)``
    contract.  Left rows with no qualifying right row get nulls.

    Plan shape: one shuffle on the key(s), one ordered window pass —
    the tolerance check is a map-side filter on the carried timestamp,
    so it adds no extra shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != ts
    ]
    out_names = {c: (c + suffix if c in left.columns else c) for c in value_cols}

    # The whole right row travels as ONE struct so the carried timestamp
    # and the carried values always come from the same row — a right row
    # with a NULL in one value column must contribute that NULL, not let
    # an older row's value leak through and dodge the tolerance check
    # (pandas merge_asof's row-wise carry contract).
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    # the struct's timestamp field must not collide with a value column
    # (duplicate struct fields make getField ambiguous)
    rts_field = "_rts"
    while rts_field in value_cols:
        rts_field += "_"
    row_type = T.StructType(
        [T.StructField(rts_field, rtypes[ts])]
        + [T.StructField(c, rtypes[c]) for c in value_cols]
    )
    l = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_asof_src"),
        F.lit(None).cast(row_type).alias("_asof_row"),
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(ts),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c not in keys and c != ts],
        F.lit(0).alias("_asof_src"),
        F.struct(
            F.col(ts).alias(rts_field),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("_asof_row"),
    ).select(*l.columns)  # align column order

    merged = l.unionByName(r)
    order = (
        [F.col(ts).asc(), F.col("_asof_src").asc()]
        if direction == "backward"
        else [F.col(ts).desc(), F.col("_asof_src").asc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        F.last("_asof_row", ignorenulls=True).over(w).alias("_carried"),
    )
    rts = F.col("_carried").getField(rts_field)
    if tolerance is not None:
        gap = (
            F.col(ts) - rts if direction == "backward" else rts - F.col(ts)
        )
        bound = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        in_tol = rts.isNotNull() & (gap <= bound)
        out_cols = [
            F.when(in_tol, F.col("_carried").getField(c)).alias(out_names[c])
            for c in value_cols
        ]
    else:
        out_cols = [
            F.col("_carried").getField(c).alias(out_names[c])
            for c in value_cols
        ]
    return (
        carried.filter(F.col("_asof_src") == 1)
        .select(*[F.col(c) for c in left.columns], *out_cols)
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Interval-containment join WITHOUT an equi key: left rows whose
    ``left_ts`` falls inside a right interval [start, end].

    The naive formulation is a broadcast-nested-loop/cartesian —
    unusable at scale.  This plans it as an equi join: each interval
    explodes to the fixed-width time bins it covers (map-side
    ``sequence``), points compute their bin, the join shuffles on the
    bin key, and the exact containment predicate filters the bin-local
    candidates.  Intervals spanning B bins appear B times — bounded,
    declared work, vs. the unbounded |L| x |R| of the nested loop.
    Pick ``bin_seconds`` near the typical interval length: wider bins
    fewer duplicates but more false candidates per bin.
    """
    shared = set(left.columns) & set(right.columns)
    if shared:
        raise ValueError(
            f"range_join inputs share column names {sorted(shared)}; the "
            "output would be ambiguous — rename one side first"
        )
    bin_col = "_bin"
    while bin_col in left.columns or bin_col in right.columns:
        bin_col += "_"
    # exact integer division: a double quotient can round a point
    # within ~50us of a bin edge into the wrong bin
    bm = bin_seconds * 1_000_000
    bin_l = F.expr(f"unix_micros(`{left_ts}`) div {bm}")
    s_bin = F.expr(f"unix_micros(`{right_start}`) div {bm}")
    e_bin = F.expr(f"unix_micros(`{right_end}`) div {bm}")
    r = right.withColumn(bin_col, F.explode(F.sequence(s_bin, e_bin)))
    l = left.withColumn(bin_col, bin_l)
    joined = l.join(r, bin_col).filter(
        (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) <= F.col(right_end))
    )
    return joined.drop(bin_col)
