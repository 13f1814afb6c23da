"""Generic as-of join vs a brute-force correlated formulation."""

from __future__ import annotations

import pyspark.sql.functions as F

from cascading_hbase_spark.catalog import load_table
from cascading_hbase_spark.functions.temporal import asof_join

SF = "/root/testdata/sf0.001"



from tests.conftest import _examples  # noqa: E402  (shared budget helper)

def test_asof_two_table(spark):
    """Purchases get the latest at-or-before signup timestamp per user;
    brute force via a conditional-max aggregation is the oracle."""
    e = load_table(spark, SF, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event")
    )
    got = asof_join(purchases, signups, on="user_id", ts="ts",
                    value_cols=["signup_event"])
    # brute force: join all earlier-or-equal signups, keep the latest
    brute = (
        purchases.alias("p")
        .join(signups.alias("s"), (F.col("p.user_id") == F.col("s.user_id"))
              & (F.col("s.ts") <= F.col("p.ts")), "left")
        .groupBy("p.event_id")
        .agg(F.max_by("s.signup_event", F.struct("s.ts", "s.signup_event")).alias("signup_event"))
    )
    g = {r.event_id: r.signup_event for r in got.collect()}
    b = {r.event_id: r.signup_event for r in brute.collect()}
    assert g == b and len(g) > 0


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 15)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (2, 99, "z")], "k long, ts long, v string"
    )
    got = {(r.k, r.ts): r.v for r in asof_join(left, right, "k", "ts").collect()}
    # ts=10 matches the equal-ts right row ('at-or-before' includes at);
    # ts=20 takes the latest earlier ('b'); k=2 has no earlier row.
    assert got == {(1, 10): "a", (1, 20): "b", (2, 15): None}


def test_asof_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 50), (2, 15)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 12, "a"), (1, 21, "b"), (2, 5, "z")], "k long, ts long, v string"
    )
    fwd = {(r.k, r.ts): r.v
           for r in asof_join(left, right, "k", "ts",
                              direction="forward").collect()}
    # earliest at-or-after: ts=10 -> 12('a'), ts=20 -> 21('b'),
    # ts=50 -> none after, k=2 ts=15 -> none after
    assert fwd == {(1, 10): "a", (1, 20): "b", (1, 50): None, (2, 15): None}

    tol = {(r.k, r.ts): r.v
           for r in asof_join(left, right, "k", "ts",
                              tolerance=3).collect()}
    # backward within 3: ts=10 no earlier; ts=20 last earlier is 12
    # (gap 8 > 3, nulled); ts=50 gap 29 nulled; k=2 gap 10 nulled
    assert tol == {(1, 10): None, (1, 20): None, (1, 50): None, (2, 15): None}

    tol2 = {(r.k, r.ts): r.v
            for r in asof_join(left, right, "k", "ts",
                               direction="forward", tolerance=3).collect()}
    # forward within 3: ts=10 -> 12 gap 2 ok; ts=20 -> 21 gap 1 ok
    assert tol2 == {(1, 10): "a", (1, 20): "b", (1, 50): None, (2, 15): None}


def test_asof_null_value_carries_row_wise(spark):
    """A NULL in the nearest right row's value column must come through
    as NULL — not let an older row's value leak past the tolerance gate
    (pandas merge_asof row-wise carry; ADVICE r03)."""
    left = spark.createDataFrame([(1, 20), (1, 31)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, "old", 7.0), (1, 19, None, 9.0)],
        "k long, ts long, v string, w double",
    )
    got = {r.ts: (r.v, r.w)
           for r in asof_join(left, right, "k", "ts").collect()}
    # nearest right row for both left rows is ts=19 with v=NULL: v must
    # be NULL (not 'old' carried from ts=10), w from the same row
    assert got == {20: (None, 9.0), 31: (None, 9.0)}

    tol = {r.ts: (r.v, r.w)
           for r in asof_join(left, right, "k", "ts", tolerance=5).collect()}
    # ts=20: nearest is 19 (gap 1 <= 5) -> (NULL, 9.0).  ts=31: gap to
    # 19 is 12 > 5 -> everything nulled; the old 'old'@10 must NOT
    # sneak in under the newer row's timestamp
    assert tol == {20: (None, 9.0), 31: (None, None)}


def test_range_join_guards(spark):
    import pytest

    from cascading_hbase_spark.functions.temporal import range_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00")], "id long, ts string"
    ).select("id", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "rid long, s string, e string",
    ).select(
        "rid",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    # shared column names are ambiguous downstream: refuse loudly
    with pytest.raises(ValueError, match="share column names"):
        range_join(left, right.withColumnRenamed("rid", "id"), "ts", "s", "e")
    # a pre-existing _bin column must survive untouched
    l2 = left.withColumn("_bin", F.lit(99))
    out = range_join(l2, right, "ts", "s", "e")
    rows = out.collect()
    assert [(r.id, r.rid, r._bin) for r in rows] == [(1, 10, 99)]


def test_asof_matches_pandas_merge_asof_property(spark):
    """Property check against pandas.merge_asof — the operator's
    namesake contract — across random keyed timelines, both directions,
    with and without tolerance, including NULL right-side values (the
    row-wise carry).  Right timestamps are unique per key: merge_asof
    ties on equal right ts by input order, which a distributed engine
    deliberately does not reproduce."""
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ts_vals = st.integers(min_value=0, max_value=50)

    @settings(
        max_examples=_examples(12), deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        left=st.lists(
            st.tuples(st.integers(0, 2), ts_vals), min_size=1, max_size=12
        ),
        right=st.lists(
            st.tuples(st.integers(0, 2), ts_vals,
                      st.one_of(st.none(), st.integers(-99, 99))),
            min_size=1, max_size=12,
            unique_by=lambda t: (t[0], t[1]),
        ),
        direction=st.sampled_from(["backward", "forward"]),
        tolerance=st.sampled_from([None, 0, 3, 10]),
    )
    def check(left, right, direction, tolerance):
        ldf = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left)],
            "k long, ts long, lid long",
        )
        rdf = spark.createDataFrame(right, "k long, ts long, v long")
        got = {
            (r.k, r.ts, r.lid): r.v
            for r in asof_join(
                ldf, rdf, "k", "ts", value_cols=["v"],
                direction=direction, tolerance=tolerance,
            ).collect()
        }
        lp = pd.DataFrame(left, columns=["k", "ts"]).assign(
            lid=range(len(left))
        ).sort_values("ts", kind="mergesort")
        rp = pd.DataFrame(right, columns=["k", "ts", "v"]).sort_values(
            "ts", kind="mergesort"
        )
        rp["v"] = rp["v"].astype("float64")
        want_df = pd.merge_asof(
            lp, rp, on="ts", by="k", direction=direction,
            tolerance=tolerance,
        )
        want = {
            (int(r.k), int(r.ts), int(r.lid)): (None if pd.isna(r.v) else int(r.v))
            for r in want_df.itertuples()
        }
        assert got == want

    check()


def test_asof_compound_keys_and_suffix(spark):
    """Multi-column join keys, and a value column that collides with a
    left column gets the _right suffix."""
    left = spark.createDataFrame(
        [(1, "x", 10, "L1"), (1, "y", 10, "L2"), (2, "x", 10, "L3")],
        "k long, sub string, ts long, v string",
    )
    right = spark.createDataFrame(
        [(1, "x", 5, "R1"), (1, "y", 7, "R2"), (2, "z", 1, "R3")],
        "k long, sub string, ts long, v string",
    )
    out = asof_join(left, right, on=["k", "sub"], ts="ts", value_cols=["v"])
    assert "v_right" in out.columns
    got = {(r.k, r.sub): r.v_right for r in out.collect()}
    # (2,'x') has no right row under the compound key — 'z' must not match
    assert got == {(1, "x"): "R1", (1, "y"): "R2", (2, "x"): None}


def test_asof_value_col_named_rts(spark):
    """A right value column literally named _rts must not collide with
    the carry struct's timestamp field."""
    left = spark.createDataFrame([(1, 20)], "k long, ts long")
    right = spark.createDataFrame([(1, 10, 7)], "k long, ts long, _rts long")
    got = asof_join(left, right, "k", "ts", value_cols=["_rts"]).collect()
    assert [(r.k, r.ts, r._rts) for r in got] == [(1, 20, 7)]


def test_range_join_matches_naive_containment_property(spark):
    """Property check of the bin-bucketed range join vs the naive
    cartesian containment filter on random point/interval sets —
    especially points landing exactly on bin edges (the integer-div
    rounding the bin math exists to get right)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cascading_hbase_spark.functions.temporal import range_join

    # micros on a coarse grid so many values hit the 10s-bin edges
    tick = st.integers(min_value=0, max_value=120).map(lambda s: s * 1_000_000)

    @settings(
        max_examples=_examples(10), deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        points=st.lists(tick, min_size=1, max_size=10),
        ivals=st.lists(st.tuples(tick, tick), min_size=1, max_size=6),
    )
    def check(points, ivals):
        ivals = [(min(s, e), max(s, e)) for s, e in ivals]
        l = spark.createDataFrame(
            [(i, p) for i, p in enumerate(points)], "pid long, us long"
        ).select("pid", F.timestamp_micros("us").alias("ts"))
        r = spark.createDataFrame(
            [(j, s, e) for j, (s, e) in enumerate(ivals)],
            "iid long, s_us long, e_us long",
        ).select(
            "iid",
            F.timestamp_micros("s_us").alias("s"),
            F.timestamp_micros("e_us").alias("e"),
        )
        got = {
            (r_.pid, r_.iid)
            for r_ in range_join(l, r, "ts", "s", "e", bin_seconds=10).collect()
        }
        want = {
            (i, j)
            for i, p in enumerate(points)
            for j, (s, e) in enumerate(ivals)
            if s <= p <= e
        }
        assert got == want

    check()
