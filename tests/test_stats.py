"""Persisted column statistics (``keyed/stats.py``): exactness of the
exact mode, the approx-NDV contract, fingerprint-based no-op /
staleness, and the meta-only commit discipline."""

from __future__ import annotations

import pytest

from cascading_hbase_spark.keyed.stats import (
    analyze_keyed,
    column_stats,
    table_stats,
)
from cascading_hbase_spark.keyed.table import (
    SinkMode,
    table_version,
    write_keyed,
)


@pytest.fixture
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (i, (i % 5) if i % 7 else None, f"s{i % 3}", [1, 2])
            for i in range(70)
        ],
        "k int, v int, s string, arr array<int>",
    )
    write_keyed(df, path, "k", retain=10)
    return path, df


def test_exact_stats_match_recomputation(spark, table):
    path, df = table
    analyze_keyed(spark, path, exact=True)
    st = table_stats(path)
    assert st["row_count"] == 70
    assert st["exact"] is True and st["data_changed"] is False
    cs = {r.column: r for r in column_stats(spark, path).collect()}
    n_null = df.filter("v is null").count()
    assert cs["v"].n_null == n_null
    assert cs["v"].n_nonnull == 70 - n_null
    assert cs["v"].n_distinct == 5
    assert cs["k"].n_distinct == 70
    assert cs["s"].min == "s0" and cs["s"].max == "s2"
    # complex column: counts only, no min/max
    assert cs["arr"].min is None and cs["arr"].max is None
    assert cs["arr"].n_nonnull == 70


def test_approx_ndv_within_contract(spark, table):
    """approx_count_distinct's default rsd is 5%; allow a generous
    5-sigma band so the test never flakes while still catching a
    broken estimator (e.g. returning row counts)."""
    path, df = table
    analyze_keyed(spark, path)  # approx (the at-scale default)
    cs = {r.column: r for r in column_stats(spark, path).collect()}
    for col, exact in (("k", 70), ("v", 5), ("s", 3)):
        got = cs[col].n_distinct
        assert abs(got - exact) <= max(2, 0.25 * exact), (col, got, exact)


def test_noop_reanalyze_and_staleness_flag(spark, table):
    path, _ = table
    analyze_keyed(spark, path, exact=True)
    v1 = table_version(path)
    analyze_keyed(spark, path, exact=True)  # fingerprint unchanged
    assert table_version(path) == v1, "no-op re-analyze must not commit"
    # switching mode IS a change
    analyze_keyed(spark, path)
    assert table_version(path) == v1 + 1
    # a data commit flips the staleness flag; re-analyze clears it
    write_keyed(
        spark.createDataFrame([(999, 1, "zz", [1])],
                              "k int, v int, s string, arr array<int>"),
        path, "k", mode=SinkMode.APPEND,
    )
    assert table_stats(path)["data_changed"] is True
    analyze_keyed(spark, path, exact=True)
    st = table_stats(path)
    assert st["data_changed"] is False and st["row_count"] == 71


def test_analyze_subset_and_validation(spark, table):
    path, _ = table
    analyze_keyed(spark, path, columns=["v"], exact=True)
    cs = column_stats(spark, path)
    assert [r.column for r in cs.collect()] == ["v"]
    with pytest.raises(ValueError, match="not in table"):
        analyze_keyed(spark, path, columns=["nope"])


def test_table_stats_requires_analysis(spark, tmp_path):
    path = str(tmp_path / "t")
    write_keyed(
        spark.createDataFrame([(1, 2)], "k int, v int"), path, "k"
    )
    with pytest.raises(KeyError, match="no stats"):
        table_stats(path)


def test_heavy_hitters_exact_and_salt_suggestion(spark, tmp_path):
    """heavy_hitters=K records the exact top-K (count desc, value asc
    total order), and suggest_salt_factor derives the skew split from
    the hottest key's share — >1 for a skewed column, 1 for a near-
    uniform one, and KeyError without heavy-hitter stats."""
    from cascading_hbase_spark.keyed.stats import suggest_salt_factor

    path = str(tmp_path / "t")
    # 'hot' owns half the rows; k is unique (uniform)
    rows = [(i, "hot" if i % 2 == 0 else f"c{i % 10}") for i in range(100)]
    write_keyed(
        spark.createDataFrame(rows, "k int, cat string"), path, "k",
        retain=10,
    )
    analyze_keyed(spark, path, exact=True, heavy_hitters=3)
    st = table_stats(path)
    hh = st["columns"]["cat"]["heavy_hitters"]
    assert hh[0] == {"value": "hot", "count": 50}
    assert len(hh) == 3 and hh[1]["count"] <= 50
    # hottest cat key = 50% of rows -> ceil(0.5 * 32) = 16 salts
    assert suggest_salt_factor(path, "cat", partitions=32) == 16
    # uniform key column: top share 1% -> 1 salt at small partitions
    assert suggest_salt_factor(path, "k", partitions=32) == 1
    # cap respected
    assert suggest_salt_factor(path, "cat", partitions=1000, cap=64) == 64
    # hh config participates in the no-op identity: changing K commits
    v1 = table_version(path)
    analyze_keyed(spark, path, exact=True, heavy_hitters=3)  # no-op
    assert table_version(path) == v1
    analyze_keyed(spark, path, exact=True, heavy_hitters=5)
    assert table_version(path) == v1 + 1
    # counts-only analysis -> KeyError from the suggester
    analyze_keyed(spark, path, exact=True)
    with pytest.raises(KeyError, match="heavy-hitter"):
        suggest_salt_factor(path, "cat")
