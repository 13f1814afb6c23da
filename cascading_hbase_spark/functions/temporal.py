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

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts: str,
    value_cols: list[str] | None = None,
    tolerance: None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent (at-or-before ``ts``)
    right row's ``value_cols`` for the same ``on`` key(s).

    Ties at equal ``ts`` resolve to the right row (at-or-before
    includes 'at').  Left rows with no earlier right row get nulls.
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != ts
    ]
    out_names = {c: (c + suffix if c in left.columns else c) for c in value_cols}

    l = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_asof_src"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_asof_{c}") for c in value_cols],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(ts),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c not in keys and c != ts],
        F.lit(0).alias("_asof_src"),
        *[F.col(c).alias(f"_asof_{c}") for c in value_cols],
    ).select(*l.columns)  # align column order

    merged = l.unionByName(r)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts), F.col("_asof_src"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(f"_asof_{c}", ignorenulls=True).over(w).alias(f"_carried_{c}")
            for c in value_cols
        ],
    )
    return (
        carried.filter(F.col("_asof_src") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"_carried_{c}").alias(out_names[c]) for c in value_cols],
        )
    )
