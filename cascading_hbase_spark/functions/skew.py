"""Skew-mitigation operators.

AQE's skew-join splitting (enabled in the engine session) handles most
runtime skew; these helpers cover the cases the optimizer can't:

- ``salted_two_phase_agg``: aggregation where a handful of group keys
  dominate.  Phase 1 aggregates on (key, salt) — the hot key's rows
  spread over ``n_salt`` reducers — phase 2 merges the per-salt partial
  aggregates.  Results are identical to a direct groupBy for the
  algebraic aggregates exposed here (sum/count/min/max), so the DuckDB
  oracle checks it exactly.
- ``salted_join``: replicate the small side ``n_salt`` times so a
  skewed big-side key spreads over ``n_salt`` reducers; exact same
  join result.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["salted_two_phase_agg", "salted_join"]

_SALT = "_salt"


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output name -> (fn, column) with fn in
    {sum, count, min, max}.  count is re-aggregated with sum in the
    merge phase; the rest merge with themselves (algebraic)."""
    salted = df.withColumn(
        _SALT, (F.rand(seed=42) * n_salt).cast("int")
    )
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[
            getattr(F, fn)(col).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    out = phase1.groupBy(*keys).agg(
        *[
            merge[fn](name).cast("bigint" if fn == "count" else dict(phase1.dtypes)[name]).alias(name)
            for name, (fn, _col) in aggs.items()
        ]
    )
    return out


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salt values, join on (keys + salt).  Exact same rows as
    the unsalted join; the hot key's rows land on ``n_salt`` reducers
    instead of one."""
    b = big.withColumn(_SALT, (F.rand(seed=7) * n_salt).cast("int"))
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return b.join(s, [*on, _SALT], how).drop(_SALT)
