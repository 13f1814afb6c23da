"""global_row_index: contiguity, order-consistency, and the
any-cut-quality correctness property (bucketing only needs to be
monotone in the key — even degenerate cuts give a correct answer)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cascading_hbase_spark.functions.enumerate import global_row_index



from tests.conftest import _examples  # noqa: E402  (shared budget helper)

@pytest.mark.parametrize("n_buckets", [1, 4, 32, 1000])
def test_contiguous_and_ordered(spark, n_buckets):
    # Unique keys, deliberately clumped (skewed) so percentile cuts
    # collide: many equal cut values must still bucket monotonically.
    keys = [1, 2, 3, 5, 8, 1000, 1001, 1002, 1003, 2000, -7, 0]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = global_row_index(df, "k", n_buckets=n_buckets).collect()
    got = {r.k: r.row_index for r in out}
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want, (n_buckets, got)


def test_extra_columns_survive(spark):
    df = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "k long, v string")
    out = global_row_index(df, "k", index_col="idx", n_buckets=2)
    assert [r.v for r in out.orderBy("idx").collect()] == ["a", "b", "c"]


def test_rejects_bad_buckets(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        global_row_index(df, "k", n_buckets=0)


def test_no_global_data_window(spark):
    """The data-scale window must be partitioned by bucket; the only
    unpartitioned window allowed is the B-row offset prefix sum."""
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    plan = (
        global_row_index(df, "k", n_buckets=8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # row_number's window spec must carry the bucket partition key
    assert "windowspecdefinition(_bucket" in plan, plan


@pytest.mark.parametrize("n_buckets,desc", [(1, False), (4, True), (32, True), (500, False)])
def test_running_sum_matches_naive_window(spark, n_buckets, desc):
    from cascading_hbase_spark.functions.enumerate import bucketed_running_sum
    from pyspark.sql import Window
    import pyspark.sql.functions as FN

    # values include ties on the key to exercise tiebreak_col
    rows = [(i, float(k), v) for i, (k, v) in enumerate(
        [(5, 10), (3, 1), (5, 2), (8, 7), (1, 4), (3, 3), (9, 5), (8, 6)]
    )]
    df = spark.createDataFrame(rows, "id long, k double, v long")
    got = {
        r.id: r.rs
        for r in bucketed_running_sum(
            df, "k", "v", sum_col="rs", descending=desc,
            n_buckets=n_buckets, tiebreak_col="id",
        ).collect()
    }
    order = FN.col("k").desc() if desc else FN.col("k").asc()
    w = Window.orderBy(order, FN.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {r.id: r.rs for r in df.withColumn("rs", FN.sum("v").over(w)).collect()}
    assert got == want, (n_buckets, desc, got, want)


def test_fuzz_enumerate_and_running_sum_vs_naive(spark):
    """Hypothesis fuzz: arbitrary key sets (negatives, clumps, tied
    keys with a tiebreak id) and bucket counts — global_row_index must
    equal the sorted-position map, bucketed_running_sum must equal the
    naive single window, ascending and descending."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import pyspark.sql.functions as FN
    from pyspark.sql import Window
    from cascading_hbase_spark.functions.enumerate import (
        bucketed_running_sum,
        global_row_index,
    )

    @settings(
        max_examples=_examples(8), deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        keys=st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=1, max_size=20,
        ),
        n_buckets=st.sampled_from([1, 2, 5, 64]),
        desc=st.booleans(),
    )
    def check(keys, n_buckets, desc):
        rows = [(i, float(k), k % 7) for i, k in enumerate(keys)]
        df = spark.createDataFrame(rows, "id long, k double, v long")
        got_rs = {
            r.id: r.rs
            for r in bucketed_running_sum(
                df, "k", "v", sum_col="rs", descending=desc,
                n_buckets=n_buckets, tiebreak_col="id",
            ).collect()
        }
        order = FN.col("k").desc() if desc else FN.col("k").asc()
        w = Window.orderBy(order, FN.col("id").asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want_rs = {
            r.id: r.rs for r in df.withColumn("rs", FN.sum("v").over(w)).collect()
        }
        assert got_rs == want_rs, (keys, n_buckets, desc)
        if len(set(keys)) == len(keys):  # unique-key contract
            got_ix = {
                r.id: r.row_index
                for r in global_row_index(df, "k", n_buckets=n_buckets).collect()
            }
            pos = {k: i for i, k in enumerate(sorted(keys))}
            want_ix = {i: pos[k] for i, (k) in enumerate(keys)}
            assert got_ix == want_ix, (keys, n_buckets)

    check()


@pytest.mark.parametrize("n_buckets,strict", [(1, False), (4, True), (32, True), (500, False)])
def test_running_max_matches_naive_window(spark, n_buckets, strict):
    from cascading_hbase_spark.functions.enumerate import bucketed_running_max
    from pyspark.sql import Window
    import pyspark.sql.functions as FN

    rows = [(i, float(k), v) for i, (k, v) in enumerate(
        [(5, 10), (3, 1), (5, 2), (8, 7), (1, 4), (3, 3), (9, 5), (8, 6)]
    )]
    df = spark.createDataFrame(rows, "id long, k double, v long")
    got = {
        r.id: r.rm
        for r in bucketed_running_max(
            df, "k", "v", max_col="rm", strict=strict,
            n_buckets=n_buckets, tiebreak_col="id",
        ).collect()
    }
    upper = -1 if strict else Window.currentRow
    w = Window.orderBy(FN.col("k").asc(), FN.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, upper
    )
    want = {r.id: r.rm for r in df.withColumn("rm", FN.max("v").over(w)).collect()}
    assert got == want, (n_buckets, strict, got, want)


def test_fuzz_running_max_vs_naive(spark):
    """Hypothesis fuzz for bucketed_running_max: tied keys, degenerate
    cuts, strict and inclusive forms — must equal the naive single
    window (strict: NULL for the global first row only)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import pyspark.sql.functions as FN
    from pyspark.sql import Window
    from cascading_hbase_spark.functions.enumerate import bucketed_running_max

    @settings(
        max_examples=_examples(8), deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        keys=st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=1, max_size=20,
        ),
        n_buckets=st.sampled_from([1, 2, 5, 64]),
        strict=st.booleans(),
    )
    def check(keys, n_buckets, strict):
        rows = [(i, float(k), (k * 13) % 23) for i, k in enumerate(keys)]
        df = spark.createDataFrame(rows, "id long, k double, v long")
        got = {
            r.id: r.rm
            for r in bucketed_running_max(
                df, "k", "v", max_col="rm", strict=strict,
                n_buckets=n_buckets, tiebreak_col="id",
            ).collect()
        }
        upper = -1 if strict else Window.currentRow
        w = Window.orderBy(FN.col("k").asc(), FN.col("id").asc()).rowsBetween(
            Window.unboundedPreceding, upper
        )
        want = {
            r.id: r.rm for r in df.withColumn("rm", FN.max("v").over(w)).collect()
        }
        assert got == want, (keys, n_buckets, strict)

    check()


@pytest.mark.parametrize("n_buckets,desc", [(1, False), (4, True), (32, False)])
def test_grouped_running_sum_matches_naive_window(spark, n_buckets, desc):
    from pyspark.sql import Window
    from cascading_hbase_spark.functions.enumerate import grouped_running_sum

    rows = [
        ("a", 5, 10, 0), ("a", 3, 1, 1), ("a", 5, 2, 2), ("b", 8, 7, 3),
        ("b", 1, 4, 4), ("a", 3, 3, 5), ("b", 9, 5, 6), ("c", 8, 6, 7),
    ]
    df = spark.createDataFrame(rows, "g string, k long, v long, tb long")
    got = {
        (r.g, r.tb): r.rs
        for r in grouped_running_sum(
            df, "g", "k", "v", sum_col="rs", descending=desc,
            n_buckets=n_buckets, tiebreak_col="tb",
        ).collect()
    }
    order = [F.col("k").desc() if desc else F.col("k").asc(), F.col("tb")]
    w = (
        Window.partitionBy("g")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.g, r.tb): r.rs
        for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    assert got == want, (n_buckets, desc)


def test_fuzz_grouped_running_sum_vs_naive(spark):
    """Randomized group/key/value mixes (ties, negatives, singleton and
    empty-ish groups) against the PARTITION BY group naive window."""
    import random

    from pyspark.sql import Window
    from cascading_hbase_spark.functions.enumerate import grouped_running_sum

    rng = random.Random(20260814)
    for trial in range(5):
        n = rng.randint(1, 60)
        rows = [
            (
                rng.choice(["g1", "g2", "g3", "g4"]),
                rng.randint(-5, 5),
                rng.randint(-100, 100),
                i,
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "g string, k long, v long, tb long")
        buckets = rng.choice([1, 2, 7, 64])
        got = {
            (r.g, r.tb): r.rs
            for r in grouped_running_sum(
                df, "g", "k", "v", sum_col="rs",
                n_buckets=buckets, tiebreak_col="tb",
            ).collect()
        }
        w = (
            Window.partitionBy("g")
            .orderBy("k", "tb")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            (r.g, r.tb): r.rs
            for r in df.withColumn("rs", F.sum("v").over(w)).collect()
        }
        assert got == want, (trial, buckets)


def test_grouped_running_sum_window_partitioned_by_group_and_bucket(spark):
    from cascading_hbase_spark.functions.enumerate import grouped_running_sum

    df = spark.createDataFrame(
        [("a", i, 1) for i in range(50)], "g string, k long, v long"
    )
    plan = (
        grouped_running_sum(df, "g", "k", "v", n_buckets=8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "windowspecdefinition(g" in plan and "_bucket" in plan, plan


def test_grouped_running_sum_keeps_null_groups(spark):
    """PARTITION BY treats NULL as its own group; the decomposition
    must not silently drop those rows (null-safe joins)."""
    from pyspark.sql import Window
    from cascading_hbase_spark.functions.enumerate import grouped_running_sum

    df = spark.createDataFrame(
        [("a", 1, 10, 0), (None, 2, 20, 1), (None, 3, 30, 2), ("a", 0, 5, 3)],
        "g string, k long, v long, tb long",
    )
    got = {
        (r.g, r.tb): r.rs
        for r in grouped_running_sum(
            df, "g", "k", "v", sum_col="rs", tiebreak_col="tb"
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("k", "tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.g, r.tb): r.rs
        for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    assert got == want and len(got) == 4


def test_reserved_column_guard(spark):
    """Inputs already containing an internal working column must raise,
    not silently collide (ADVICE r05)."""
    import pytest

    from cascading_hbase_spark.functions.enumerate import (
        bucketed_running_sum,
        global_row_index,
        grouped_running_sum,
    )

    df = spark.range(10).select(
        F.col("id"), F.lit(1).alias("v"), F.lit(0).alias("_bucket")
    )
    with pytest.raises(ValueError, match="reserved"):
        global_row_index(df, "id")
    with pytest.raises(ValueError, match="reserved"):
        bucketed_running_sum(df, "id", "v")
    with pytest.raises(ValueError, match="reserved"):
        grouped_running_sum(df.withColumn("_g", F.lit(1)), "v", "id", "v")
