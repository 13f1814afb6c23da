"""Skew-mitigation operators.

Policy — when to salt vs when to let AQE handle it (tested by
``tests/test_skew.py::test_skew_policy_aqe_vs_salting``):

- **Join skew: delegate to AQE.** The engine session enables
  ``spark.sql.adaptive.skewJoin.enabled`` (``session.py``), which
  splits oversized sort-merge join partitions at runtime by replaying
  the other side — the same trick as manual salting, chosen from
  actual partition sizes instead of a guessed ``n_salt``.  Plain
  ``df.join`` is therefore the DEFAULT for skewed equi-joins;
  ``salted_join`` remains for the cases AQE's splitter does not
  cover — broadcast-ineligible joins that AQE plans as shuffled-hash
  (no sort-merge partitions to split), and deployments where AQE is
  off.
- **Aggregation skew: salt, AQE will not help.** AQE never splits a
  hash-aggregate partition: every row of a hot group key must reach
  the one reducer owning that key.  Map-side partial aggregation
  absorbs skew only when the per-key state is tiny; for hot keys with
  wide state (count-distinct-like, collect-like) the final aggregate
  still serializes on one task.  ``salted_two_phase_agg`` aggregates
  on (key, salt) first — the hot key's rows spread over ``n_salt``
  reducers — then merges per-salt partials.  Results are identical to
  a direct groupBy for the algebraic aggregates exposed here
  (sum/count/min/max), so the DuckDB oracle checks it exactly.

``salted_join``: replicate the small side ``n_salt`` times so a skewed
big-side key spreads over ``n_salt`` reducers; exact same join result.

**Stats-driven factors (r13, the default planning path):** both
operators accept ``n_salt="auto"`` plus ``stats_path=<keyed table>``
— the factor resolves from the table's PERSISTED heavy-hitter stats
(``analyze_keyed(heavy_hitters=K)`` first) via
``keyed.stats.suggest_salt_factor``, sized to the SESSION's
``spark.sql.shuffle.partitions``: the measured hottest-key share turns
into ``ceil(top_share x partitions)`` salts, 1 when the key space is
balanced.  A resolved factor of 1 takes the SINGLE-PHASE plan (plain
groupBy / plain join — no salt column, one exchange), so the analyzed
stats visibly flip the physical plan, not just a constant.  Stale
stats still resolve by default (a salt factor is a balance knob —
any value is correct); ``require_fresh=True`` raises
``StaleStatsError`` instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["salted_two_phase_agg", "salted_join"]

_SALT = "_salt"


def _resolve_n_salt(
    n_salt, df: DataFrame, key_col: str, stats_path, require_fresh: bool
) -> int:
    """``"auto"`` -> the measured factor from the keyed table's
    persisted heavy-hitter stats, sized to this session's shuffle
    parallelism; an explicit int passes through unchanged."""
    if n_salt == "auto":
        if stats_path is None:
            raise ValueError(
                "n_salt='auto' needs stats_path=<keyed table path> "
                "(run analyze_keyed(..., heavy_hitters=K) on it first)"
            )
        from cascading_hbase_spark.keyed.stats import suggest_salt_factor

        partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        return suggest_salt_factor(
            stats_path, key_col, partitions=partitions,
            require_fresh=require_fresh,
        )
    return int(n_salt)


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int | str = 16,
    stats_path: str | None = None,
    require_fresh: bool = False,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output name -> (fn, column) with fn in
    {sum, count, min, max}.  count is re-aggregated with sum in the
    merge phase; the rest merge with themselves (algebraic).

    ``n_salt="auto"`` resolves the factor from ``stats_path``'s
    persisted heavy hitters (see module docstring); a factor of 1 —
    explicit or resolved from balanced stats — takes the direct
    single-phase plan (identical rows, one exchange instead of two
    aggregates)."""
    n_salt = _resolve_n_salt(n_salt, df, keys[0], stats_path, require_fresh)
    if n_salt <= 1:
        # single-phase: Spark's agg dtypes here (count -> bigint,
        # sum(int) -> bigint, min/max -> column type) match the
        # two-phase merge's output exactly, so the branches are
        # interchangeable row- and schema-wise
        return df.groupBy(*keys).agg(
            *[
                getattr(F, fn)(col).alias(name)
                for name, (fn, col) in aggs.items()
            ]
        )
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
    n_salt: int | str = 16,
    how: str = "inner",
    stats_path: str | None = None,
    require_fresh: bool = False,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salt values, join on (keys + salt).  Exact same rows as
    the unsalted join; the hot key's rows land on ``n_salt`` reducers
    instead of one.

    ``n_salt="auto"`` resolves the factor from ``stats_path``'s
    persisted heavy hitters, measured on the BIG side's join key (see
    module docstring); a resolved factor of 1 skips salting entirely —
    no replication of the small side, the plain join plan."""
    n_salt = _resolve_n_salt(n_salt, big, on[0], stats_path, require_fresh)
    if n_salt <= 1:
        return big.join(small, on, how)
    b = big.withColumn(_SALT, (F.rand(seed=7) * n_salt).cast("int"))
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return b.join(s, [*on, _SALT], how).drop(_SALT)


def misra_gries_candidates(
    tokens_df, token_col: str, k: int = 64,
):
    """Mergeable Misra-Gries heavy-hitter candidates: each partition
    summarizes its token stream with at most ``k`` counters (an
    Arrow-batched ``mapInPandas`` — bounded memory regardless of
    cardinality), partial summaries merge with ONE tiny hash aggregate.

    Guarantee (the checkable contract): per partition, a dropped token
    has local frequency <= N_p/k, so any token with GLOBAL frequency
    > N/k survives in at least one partial summary — the merged
    candidate set is a superset of the true heavy hitters.  The
    candidate set itself depends on partitioning (not oracle-stable);
    the superset guarantee is what callers verify.

    This is the bounded-memory path for top-token accounting at 100 TB
    where the exact token->count aggregate's key space no longer fits:
    sketch candidates first, exact-count only the candidates after."""
    import pandas as pd
    import pyspark.sql.functions as F

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for t in pdf[token_col]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    # decrement-all step, dropping zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {token_col: list(counters), "mg_count": list(counters.values())}
            )

    partials = tokens_df.select(token_col).mapInPandas(
        summarize, f"`{token_col}` string, mg_count long"
    )
    return partials.groupBy(token_col).agg(
        F.sum("mg_count").alias("mg_count")
    )
