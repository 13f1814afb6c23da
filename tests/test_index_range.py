"""Secondary-index RANGE lookups, the order-preserving key encoding
behind them, and COVERING (index-only) lookups.

The reference's tables are reachable by row key only
(HBaseTap.java:52-60); the HBase ecosystem answer to "range scan a
non-key column" is a second table whose rowkey is an ORDER-PRESERVING
encoding of the value (OrderedBytes) — these tests pin the engine-side
analogue: ``lpad(v + 2^63, 20, '0')`` for integrals, the same over
``unix_micros`` for TimestampType (v4: instant-ordered and
session-timezone-independent — the rendered local string both
mismatches cross-timezone probes and inverts across a DST fall-back
fold), offset-padded unscaled integers for decimals up to precision
35, ISO strings for date/TimestampNTZ, identity for strings.
"""

from __future__ import annotations

import datetime
import os

import pyspark.sql.functions as F
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from tests.conftest import _examples


def _mk(spark, tmp_path, rows, schema, key="k", **kw):
    from cascading_hbase_spark.keyed.table import write_keyed

    path = str(tmp_path / "t")
    df = spark.createDataFrame(rows, schema)
    write_keyed(df, path, key, **kw)
    return path, df


# ---------------------------------------------------------------------------
# the encoding itself
# ---------------------------------------------------------------------------

def test_integral_encoding_is_order_preserving_and_matches_local(spark):
    """The Spark-side encoded form sorts exactly like the values — over
    the FULL int64 range including both extremes and the zero crossing —
    and the Python fast path (`_encode_value`) produces bit-identical
    strings (a probe encoded differently from the stored key would
    silently miss)."""
    from pyspark.sql.types import LongType

    from cascading_hbase_spark.keyed.index import _encode_expr, _encode_value

    vals = [
        -(2**63), -(2**63) + 1, -10**18, -65536, -2, -1, 0, 1, 2, 9, 10,
        11, 99, 100, 65535, 10**18, 2**63 - 2, 2**63 - 1,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    enc = [
        r.e
        for r in df.select(_encode_expr(F.col("v"), LongType()).alias("e"))
        .orderBy("v")
        .collect()
    ]
    assert enc == sorted(enc), "encoded order diverged from value order"
    assert all(len(e) == 20 for e in enc), "fixed-width padding broke"
    local = [_encode_value(spark, v, LongType()) for v in vals]
    assert local == enc, "local probe encoding != stored key encoding"


def test_temporal_and_string_encodings_order_preserving(spark):
    """Timestamp CAST AS STRING drops trailing fraction zeros, which is
    still order-preserving ('…00' < '…00.001' < '…00.25' < '…00.5');
    dates are fixed-width ISO."""
    from pyspark.sql.types import TimestampType

    from cascading_hbase_spark.keyed.index import _encode_expr

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    ts = [
        base,
        base + datetime.timedelta(microseconds=1000),
        base + datetime.timedelta(microseconds=250000),
        base + datetime.timedelta(microseconds=500000),
        base + datetime.timedelta(seconds=1),
        base + datetime.timedelta(days=40),
    ]
    df = spark.createDataFrame([(t,) for t in ts], "t timestamp")
    enc = [
        r.e
        for r in df.select(_encode_expr(F.col("t"), TimestampType()).alias("e"))
        .orderBy("t")
        .collect()
    ]
    assert enc == sorted(enc), enc


def test_decimal_encoding_order_preserving_and_matches_probe(spark):
    """v4 decimal encoding (offset-padded unscaled integer): the
    Spark-side encoded form sorts exactly like the values — negatives,
    the zero crossing, sub-cent fractions, and both extremes of
    decimal(12,2) — and the probe encoding (``_encode_value``, the
    1-row driver-side evaluation of the same expression) produces
    bit-identical strings."""
    from decimal import Decimal

    from pyspark.sql.types import DecimalType

    from cascading_hbase_spark.keyed.index import (
        _encode_expr,
        _encode_value,
        _orderable,
    )

    dtype = DecimalType(12, 2)
    assert _orderable(dtype)
    vals = [
        Decimal("-9999999999.99"), Decimal("-9999999999.98"),
        Decimal("-100.50"), Decimal("-100.05"), Decimal("-0.01"),
        Decimal("0.00"), Decimal("0.01"), Decimal("0.10"),
        Decimal("1.00"), Decimal("2.00"), Decimal("10.00"),
        Decimal("9999999999.98"), Decimal("9999999999.99"),
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v decimal(12,2)")
    enc = [
        r.e
        for r in df.select(_encode_expr(F.col("v"), dtype).alias("e"))
        .orderBy("v")
        .collect()
    ]
    assert enc == sorted(enc), "encoded order diverged from value order"
    assert all(len(e) == 13 for e in enc), "fixed-width padding broke"
    local = [_encode_value(spark, v, dtype) for v in vals]
    assert local == enc, "probe encoding != stored key encoding"


def test_decimal_above_precision_35_stays_equality_only(spark, tmp_path):
    """decimal(38, s) cannot ride the shift arithmetic (the sum type
    would exceed Spark's 38-digit ceiling, where precision is reduced
    by silent ROUNDING): such columns stay on the CAST-string equality
    encoding and range lookups refuse with the zone-map pointer."""
    from decimal import Decimal

    from pyspark.sql.types import DecimalType

    from cascading_hbase_spark.keyed.index import (
        _orderable,
        create_index,
        index_lookup,
        index_range_lookup,
    )

    assert not _orderable(DecimalType(38, 10))
    assert not _orderable(DecimalType(36, 0))
    path, _ = _mk(
        spark, tmp_path,
        [(i, Decimal(i) / 4) for i in range(8)],
        "k int, v decimal(38,10)",
    )
    create_index(spark, path, "v")
    got = index_lookup(spark, path, "v", Decimal("0.75")).collect()
    assert [r.k for r in got] == [3]
    with pytest.raises(ValueError, match="zone maps"):
        index_range_lookup(spark, path, "v", Decimal("0"), Decimal("1"))


def test_timestamp_encoding_instant_ordered_across_dst_fold(spark):
    """The v4 TimestampType encoding orders by the INSTANT.  Across the
    America/Los_Angeles 2024-11-03 fall-back fold the RENDERED local
    string inverts (08:30Z renders 01:30:00 PDT, the later 09:15Z
    renders 01:15:00 PST — the r12 ADVICE failure mode); unix-micros
    encoding stays monotone."""
    from pyspark.sql.types import TimestampType

    from cascading_hbase_spark.keyed.index import _encode_expr

    utc = datetime.timezone.utc
    ts = [  # strictly increasing instants straddling the fold
        datetime.datetime(2024, 11, 3, 7, 45, tzinfo=utc),   # 00:45 PDT
        datetime.datetime(2024, 11, 3, 8, 30, tzinfo=utc),   # 01:30 PDT
        datetime.datetime(2024, 11, 3, 9, 15, tzinfo=utc),   # 01:15 PST!
        datetime.datetime(2024, 11, 3, 10, 5, tzinfo=utc),   # 02:05 PST
    ]
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        df = spark.createDataFrame([(t,) for t in ts], "t timestamp")
        rendered = [
            r.s for r in
            df.select(F.col("t").cast("string").alias("s"), "t")
            .orderBy("t").collect()
        ]
        assert rendered != sorted(rendered), (
            "fixture lost its point: the rendered local strings should "
            "invert across the fold"
        )
        enc = [
            r.e for r in
            df.select(_encode_expr(F.col("t"), TimestampType()).alias("e"), "t")
            .orderBy("t").collect()
        ]
        assert enc == sorted(enc), "v4 timestamp encoding not instant-monotone"
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)


def test_timestamp_index_probe_across_session_timezones(spark, tmp_path):
    """An index on a TimestampType column built under one session
    timezone serves equality and range probes issued under a DIFFERENT
    session timezone (the r12 ADVICE: the v3 rendered-string encoding
    silently returned empty results here).  Aware-datetime probes pin
    the instant explicitly."""
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_lookup,
        index_range_lookup,
    )

    utc = datetime.timezone.utc
    base = datetime.datetime(2024, 3, 1, 12, 0, tzinfo=utc)
    rows = [
        (i, base + datetime.timedelta(hours=i)) for i in range(8)
    ]
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        path, _ = _mk(spark, tmp_path, rows, "k int, t timestamp")
        create_index(spark, path, "t")
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        got = index_lookup(
            spark, path, "t", base + datetime.timedelta(hours=3)
        ).collect()
        assert [r.k for r in got] == [3]
        got = index_range_lookup(
            spark, path, "t",
            base + datetime.timedelta(hours=2),
            base + datetime.timedelta(hours=5),
            include_upper=False,
        )
        assert sorted(r.k for r in got.collect()) == [2, 3, 4]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)


def test_decimal_range_lookup_matches_filter_across_wave(spark, tmp_path):
    """End-to-end: a decimal(10,2) money column, incrementally
    maintained across inserts / value-moves / deletes, then ranged
    through the index — result equals the main-table filter."""
    from decimal import Decimal

    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_range_lookup,
        refresh_index,
    )
    from cascading_hbase_spark.keyed.table import (
        SinkMode,
        delete_keyed,
        read_keyed,
        write_keyed,
    )

    cents = lambda i: Decimal(i * 37 % 500 - 250) / 4  # noqa: E731
    rows = [(i, cents(i)) for i in range(24)]
    path, _ = _mk(
        spark, tmp_path, rows, "k int, v decimal(10,2)", retain=10
    )
    create_index(spark, path, "v")
    wave = spark.createDataFrame(
        [(i, cents(i) * 2) for i in range(0, 24, 5)]
        + [(100 + i, cents(i) + Decimal("0.01")) for i in range(4)],
        "k int, v decimal(10,2)",
    )
    write_keyed(wave, path, "k", mode=SinkMode.APPEND)
    delete_keyed(
        spark, path,
        spark.createDataFrame([(i,) for i in range(0, 24, 7)], "k int"),
    )
    refresh_index(spark, path, "v")
    lo, hi = Decimal("-20.00"), Decimal("30.25")
    got = sorted(
        r.k for r in index_range_lookup(spark, path, "v", lo, hi).collect()
    )
    want = sorted(
        r.k for r in read_keyed(spark, path)
        .filter((F.col("v") >= lo) & (F.col("v") <= hi)).collect()
    )
    assert got == want and got, (got, want)


@settings(max_examples=_examples(20), deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2, max_size=8, unique=True,
    )
)
def test_integral_encoding_monotone_property(vals):
    """Pure-local property over the Python mirror: encoding is strictly
    monotone (sorted values <=> sorted encodings).  The Spark-vs-local
    agreement test above makes this transfer to the stored keys."""
    enc = [format(v + 2**63, "020d") for v in vals]
    assert sorted(range(len(vals)), key=lambda i: vals[i]) == sorted(
        range(len(vals)), key=lambda i: enc[i]
    )


# ---------------------------------------------------------------------------
# range lookup semantics
# ---------------------------------------------------------------------------

def test_range_lookup_matches_filter_all_bound_shapes(spark, tmp_path):
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_range_lookup,
    )

    path, df = _mk(
        spark, tmp_path,
        [(i, i * 7 - 50) for i in range(60)], "k int, v long",
    )
    create_index(spark, path, "v")

    def got(**kw):
        return sorted(r.k for r in index_range_lookup(spark, path, "v", **kw).collect())

    def exp(cond):
        return sorted(r.k for r in df.filter(cond).collect())

    assert got(lower=-30, upper=30) == exp("v between -30 and 30")
    assert got(lower=-30, upper=30, include_lower=False) == exp("v > -30 and v <= 30")
    assert got(lower=-30, upper=30, include_upper=False) == exp("v >= -30 and v < 30")
    assert got(lower=100) == exp("v >= 100")
    assert got(upper=0) == exp("v <= 0")
    assert got() == exp("v is not null")
    # bound values that EXIST as stored values (boundary exactness)
    assert got(lower=-50, upper=-50) == exp("v = -50")
    assert got(lower=-50, upper=-50, include_upper=False) == []


def test_range_lookup_prunes_index_buckets(spark, tmp_path):
    """A narrow range reads FEWER index bucket files than the open
    scan — the composite-key layout turns the value range into a key
    range, so bucket-dir pruning applies (at 100 TB: O(matching rows),
    not O(index))."""
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_range_lookup,
    )

    path, df = _mk(
        spark, tmp_path,
        [(i, i) for i in range(400)], "k int, v long",
    )
    create_index(spark, path, "v", n_buckets=8)
    narrow = index_range_lookup(spark, path, "v", 10, 20, fields=["k", "v"])
    full = index_range_lookup(spark, path, "v", fields=["k", "v"])
    nf, ff = set(narrow.inputFiles()), set(full.inputFiles())
    assert len(nf) < len(ff), (len(nf), len(ff))
    assert sorted(r.k for r in narrow.collect()) == list(range(10, 21))


def test_range_lookup_refuses_unordered_types(spark, tmp_path):
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_lookup,
        index_range_lookup,
    )

    path, _ = _mk(
        spark, tmp_path,
        [(i, float(i) / 4) for i in range(20)], "k int, x double",
    )
    create_index(spark, path, "x")
    with pytest.raises(ValueError, match="zone maps"):
        index_range_lookup(spark, path, "x", 1.0, 2.0)
    # equality through the same index still works (encoding is
    # injective even where it is not ordered)
    assert [r.k for r in index_lookup(spark, path, "x", 1.25).collect()] == [5]


def test_range_lookup_timestamp_ntz(spark, tmp_path):
    """TIMESTAMP_NTZ (what the driver testdata's o_orderdate actually
    is) ranges through the same ISO-string encoding."""
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_range_lookup,
    )

    t0 = datetime.datetime(2024, 5, 1)
    rows = [(i, t0 + datetime.timedelta(hours=i * 7)) for i in range(40)]
    path, df = _mk(spark, tmp_path, rows, "k int, t timestamp_ntz")
    create_index(spark, path, "t")
    lo = t0 + datetime.timedelta(days=2)
    hi = t0 + datetime.timedelta(days=7)
    got = sorted(
        r.k for r in index_range_lookup(spark, path, "t", lo, hi).collect()
    )
    exp = sorted(r.k for r in df.filter(
        (F.col("t") >= F.lit(lo)) & (F.col("t") <= F.lit(hi))
    ).collect())
    assert got == exp and got, got


def test_range_lookup_dates(spark, tmp_path):
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_range_lookup,
    )

    d0 = datetime.date(2023, 12, 25)
    rows = [(i, d0 + datetime.timedelta(days=i)) for i in range(30)]
    path, df = _mk(spark, tmp_path, rows, "k int, d date")
    create_index(spark, path, "d")
    lo, hi = datetime.date(2024, 1, 1), datetime.date(2024, 1, 10)
    got = sorted(
        r.k for r in index_range_lookup(spark, path, "d", lo, hi).collect()
    )
    exp = sorted(r.k for r in df.filter(
        (F.col("d") >= F.lit(lo)) & (F.col("d") <= F.lit(hi))
    ).collect())
    assert got == exp and got, got


def test_range_lookup_point_in_time_pins_build_snapshot(spark, tmp_path):
    from cascading_hbase_spark.keyed.index import (
        StaleIndexError,
        create_index,
        index_range_lookup,
    )
    from cascading_hbase_spark.keyed.table import SinkMode, write_keyed

    path, _ = _mk(
        spark, tmp_path,
        [(i, i) for i in range(10)], "k int, v long", retain=10,
    )
    create_index(spark, path, "v")
    # move k=3 out of the range AFTER the index build
    write_keyed(
        spark.createDataFrame([(3, 999)], "k int, v long"),
        path, "k", mode=SinkMode.APPEND,
    )
    with pytest.raises(StaleIndexError):
        index_range_lookup(spark, path, "v", 0, 5)
    pit = index_range_lookup(spark, path, "v", 0, 5, check_fresh=False)
    # the point-in-time contract: k=3 WAS in range at the build snapshot
    assert sorted(r.k for r in pit.collect()) == [0, 1, 2, 3, 4, 5]
    assert [r.v for r in pit.filter("k = 3").collect()] == [3]


# ---------------------------------------------------------------------------
# covering (index-only) lookups
# ---------------------------------------------------------------------------

def test_covering_lookup_never_touches_main_table(spark, tmp_path):
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_lookup,
        index_range_lookup,
    )

    path, df = _mk(
        spark, tmp_path,
        [(i, i % 5, f"name{i}") for i in range(50)],
        "k int, grp long, name string",
    )
    create_index(spark, path, "grp", include=["name"])
    covered = index_range_lookup(
        spark, path, "grp", 1, 2, fields=["k", "grp", "name"]
    )
    main_dirs = {f for f in covered.inputFiles() if "__kt_idx_" not in f}
    assert not main_dirs, f"covering lookup read main-table files: {main_dirs}"
    got = sorted((r.k, r.grp, r.name) for r in covered.collect())
    exp = sorted(
        (r.k, r.grp, r.name)
        for r in df.filter("grp between 1 and 2").collect()
    )
    assert got == exp
    # an UNcovered field falls back to the main-table semi-join
    uncovered = index_lookup(spark, path, "grp", 1, fields=["k", "name", "grp"])
    assert sorted(r.k for r in uncovered.collect()) == sorted(
        r.k for r in df.filter("grp = 1").collect()
    )


def test_covering_payload_maintained_incrementally(spark, tmp_path):
    """An update that changes ONLY an include column must refresh the
    covering payload (same composite key upserted) — the value-moved
    gate alone would leave the index serving a stale covered value."""
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_lookup,
        refresh_index,
    )
    from cascading_hbase_spark.keyed.table import SinkMode, write_keyed

    path, _ = _mk(
        spark, tmp_path,
        [(i, i % 3, f"name{i}") for i in range(12)],
        "k int, grp long, name string", retain=10,
    )
    create_index(spark, path, "grp", include=["name"])
    write_keyed(
        spark.createDataFrame([(4, 4 % 3, "RENAMED")],
                              "k int, grp long, name string"),
        path, "k", mode=SinkMode.APPEND,
    )
    refresh_index(spark, path, "grp")
    got = {
        (r.k, r.name)
        for r in index_lookup(
            spark, path, "grp", 1, fields=["k", "name"]
        ).collect()
    }
    assert (4, "RENAMED") in got and (4, "name4") not in got
    # index table holds exactly one row per live (value, key)
    from cascading_hbase_spark.keyed.index import _index_path
    from cascading_hbase_spark.keyed.table import read_keyed

    idx = read_keyed(spark, _index_path(path, "grp"))
    assert idx.count() == idx.select("ref_key").distinct().count() == 12


def test_covering_rebuild_preserves_include_list(spark, tmp_path):
    """refresh_index's full-rebuild fallback (here: a vacuumed-past
    stamp is simulated by a REPLACE... use incarnation change) keeps
    the stamped include list."""
    from cascading_hbase_spark.keyed.index import (
        _index_path,
        create_index,
        index_lookup,
        refresh_index,
    )
    from cascading_hbase_spark.keyed.table import (
        SinkMode,
        _load_meta,
        write_keyed,
    )

    path, _ = _mk(
        spark, tmp_path,
        [(i, i % 3, f"n{i}") for i in range(9)],
        "k int, grp long, name string",
    )
    create_index(spark, path, "grp", include=["name"])
    # REPLACE the main table: rebuild signal
    write_keyed(
        spark.createDataFrame(
            [(i, i % 3, f"m{i}") for i in range(9)],
            "k int, grp long, name string",
        ),
        path, "k", mode=SinkMode.REPLACE,
    )
    refresh_index(spark, path, "grp")
    info = _load_meta(_index_path(path, "grp"))["index_of"]
    assert info["include"] == ["name"]
    got = {
        (r.k, r.name)
        for r in index_lookup(spark, path, "grp", 0, fields=["k", "name"]).collect()
    }
    assert got == {(0, "m0"), (3, "m3"), (6, "m6")}


def test_covering_lookup_honors_row_ttl(spark, tmp_path):
    """Row TTL is a read-time filter on the MAIN table, so an
    index-only projection would serve EXPIRED rows — under a TTL
    policy, covered lookups must fall back to the semi-join (which
    reads the main table and applies the filter)."""
    import time

    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_range_lookup,
    )
    from cascading_hbase_spark.keyed.table import write_keyed

    path = str(tmp_path / "t")
    now = time.time()
    df = spark.createDataFrame(
        [(1, 10, now - 10_000.0), (2, 20, now - 10_000.0),
         (3, 30, now - 1.0)],
        "k int, v long, ts double",
    )
    write_keyed(df, path, "k", ttl={"col": "ts", "seconds": 3600})
    create_index(spark, path, "v", include=["ts"])
    got = index_range_lookup(spark, path, "v", 0, 100, fields=["k", "v"])
    # the expired rows (1, 2) must NOT be served, and the plan must
    # have read the main table to know that
    assert sorted(r.k for r in got.collect()) == [3]
    assert {f for f in got.inputFiles() if "__kt_idx_" not in f}, (
        "TTL table lookup never read the main table — expiry bypassed"
    )


def test_create_index_validates_include(spark, tmp_path):
    from cascading_hbase_spark.keyed.index import create_index

    path, _ = _mk(
        spark, tmp_path, [(1, 2, "a")], "k int, grp long, name string"
    )
    with pytest.raises(ValueError, match="not in table"):
        create_index(spark, path, "grp", include=["nope"])
    with pytest.raises(ValueError, match="always covered"):
        create_index(spark, path, "grp", include=["k"])


def test_in_list_lookup_matches_filter(spark, tmp_path):
    """``index_in_lookup``: one tight range scan per distinct probe
    value, unioned; duplicates deduped; covered fields index-only."""
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_in_lookup,
    )

    path, df = _mk(
        spark, tmp_path,
        [(i, (i * 7) % 23) for i in range(60)], "k int, v long",
    )
    create_index(spark, path, "v")
    got = sorted(
        r.k
        for r in index_in_lookup(
            spark, path, "v", [3, 11, 11, 19, 999]
        ).collect()
    )
    exp = sorted(r.k for r in df.filter("v in (3, 11, 19, 999)").collect())
    assert got == exp and got
    cov = index_in_lookup(spark, path, "v", [3, 19], fields=["k", "v"])
    assert not {f for f in cov.inputFiles() if "__kt_idx_" not in f}
    assert sorted(r.k for r in cov.collect()) == sorted(
        r.k for r in df.filter("v in (3, 19)").collect()
    )
    with pytest.raises(ValueError, match="at least one"):
        index_in_lookup(spark, path, "v", [])


def test_in_list_lookup_composite_leading_tuples(spark, tmp_path):
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_in_lookup,
    )

    rows = [(i, f"cat{i % 3}", (i * 7) % 50) for i in range(60)]
    path, df = _mk(spark, tmp_path, rows, "k int, cat string, v long")
    create_index(spark, path, ["cat", "v"])
    got = sorted(
        r.k
        for r in index_in_lookup(
            spark, path, ["cat", "v"], [("cat1", 49), ("cat2",)]
        ).collect()
    )
    exp = sorted(
        r.k
        for r in df.filter(
            "(cat = 'cat1' and v = 49) or cat = 'cat2'"
        ).collect()
    )
    assert got == exp and got


# ---------------------------------------------------------------------------
# composite (multi-column) indexes
# ---------------------------------------------------------------------------

def test_composite_full_tuple_and_leading_prefix(spark, tmp_path):
    """``create_index(path, ["cat", "v"])``: full-tuple equality and
    leading-prefix equality are each ONE contiguous key-range scan."""
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_lookup,
    )

    rows = [(i, f"cat{i % 3}", (i * 7) % 50) for i in range(60)]
    path, df = _mk(spark, tmp_path, rows, "k int, cat string, v long")
    create_index(spark, path, ["cat", "v"])
    # full tuple
    got = sorted(
        r.k for r in index_lookup(spark, path, ["cat", "v"], ("cat1", 49)).collect()
    )
    exp = sorted(r.k for r in df.filter("cat = 'cat1' and v = 49").collect())
    assert got == exp and got, got
    # leading prefix (cat only)
    got = sorted(
        r.k for r in index_lookup(spark, path, ["cat", "v"], ("cat2",)).collect()
    )
    exp = sorted(r.k for r in df.filter("cat = 'cat2'").collect())
    assert got == exp and got
    # too many probe values refused
    with pytest.raises(ValueError, match="1..2 leading values"):
        index_lookup(spark, path, ["cat", "v"], ("cat1", 21, 99))


def test_composite_prefix_plus_range(spark, tmp_path):
    """The classic ``a = ? AND b BETWEEN ? AND ?`` shape: equality on
    the leading column + range on the next, one scan, served
    INDEX-ONLY when covered."""
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_range_lookup,
    )

    rows = [(i, f"cat{i % 3}", (i * 7) % 50, i * 1.5) for i in range(90)]
    path, df = _mk(
        spark, tmp_path, rows, "k int, cat string, v long, x double"
    )
    create_index(spark, path, ["cat", "v"], include=["x"])
    got = index_range_lookup(
        spark, path, ["cat", "v"], 10, 30, prefix=("cat1",),
        fields=["k", "cat", "v", "x"],
    )
    assert not {f for f in got.inputFiles() if "__kt_idx_" not in f}, (
        "covered composite range lookup touched the main table"
    )
    g = sorted((r.k, r.cat, r.v, r.x) for r in got.collect())
    e = sorted(
        (r.k, r.cat, r.v, r.x)
        for r in df.filter("cat = 'cat1' and v between 10 and 30").collect()
    )
    assert g == e and g
    # open range over the full prefix region == prefix equality
    all_cat1 = index_range_lookup(
        spark, path, ["cat", "v"], prefix=("cat1",)
    )
    assert all_cat1.count() == df.filter("cat = 'cat1'").count()
    # range on the FIRST column with no prefix still works
    got0 = sorted(
        r.k
        for r in index_range_lookup(
            spark, path, ["cat", "v"], "cat0", "cat1"
        ).collect()
    )
    exp0 = sorted(
        r.k for r in df.filter("cat between 'cat0' and 'cat1'").collect()
    )
    assert got0 == exp0
    # prefix covering every column: nothing left to range over
    with pytest.raises(ValueError, match="nothing"):
        index_range_lookup(spark, path, ["cat", "v"], prefix=("cat1", 5))


def test_composite_incremental_maintenance(spark, tmp_path):
    """Value moves in EITHER component retract the old composite key;
    deletes retract unconditionally; the refresh is the incremental
    changefeed delta, not a rebuild."""
    from cascading_hbase_spark.keyed.index import (
        _index_path,
        create_index,
        index_lookup,
        refresh_index,
    )
    from cascading_hbase_spark.keyed.table import (
        SinkMode,
        _load_meta,
        delete_keyed,
        read_keyed,
        write_keyed,
    )

    rows = [(i, f"cat{i % 2}", i) for i in range(10)]
    path, _ = _mk(
        spark, tmp_path, rows, "k int, cat string, v long", retain=10
    )
    create_index(spark, path, ["cat", "v"])
    # move k=2's second component, k=3's first component; delete k=4
    write_keyed(
        spark.createDataFrame(
            [(2, "cat0", 999), (3, "catX", 3)], "k int, cat string, v long"
        ),
        path, "k", mode=SinkMode.APPEND,
    )
    delete_keyed(spark, path, spark.createDataFrame([(4,)], "k int"))
    v_before = _load_meta(_index_path(path, ["cat", "v"]))["version"]
    refresh_index(spark, path, ["cat", "v"])
    imeta = _load_meta(_index_path(path, ["cat", "v"]))
    assert imeta["version"] == v_before + 1, "refresh was not one MERGE commit"

    def _both(value):
        got = sorted(
            r.k
            for r in index_lookup(spark, path, ["cat", "v"], value).collect()
        )
        return got

    assert _both(("cat0", 999)) == [2]
    assert _both(("cat0", 2)) == []          # old composite key retracted
    assert _both(("catX", 3)) == [3]
    assert _both(("cat0", 4)) == []          # deleted
    # index table has exactly one row per live key
    idx = read_keyed(spark, _index_path(path, ["cat", "v"]))
    assert idx.count() == 9


def test_composite_null_component_transitions(spark, tmp_path):
    """A row whose ANY indexed component goes NULL leaves the index
    (componentwise SQL convention: the old composite key is retracted,
    no new one is written); a later update back to a value re-enters.
    Both maintained incrementally."""
    from cascading_hbase_spark.keyed.index import (
        _index_path,
        create_index,
        index_lookup,
        refresh_index,
    )
    from cascading_hbase_spark.keyed.table import (
        SinkMode,
        read_keyed,
        write_keyed,
    )

    path, _ = _mk(
        spark, tmp_path,
        [(1, "a", 10), (2, "a", 20)], "k int, cat string, v long",
        retain=10,
    )
    create_index(spark, path, ["cat", "v"])
    # v -> NULL: row 1 leaves the index
    write_keyed(
        spark.createDataFrame([(1, "a", None)], "k int, cat string, v long"),
        path, "k", mode=SinkMode.APPEND,
    )
    refresh_index(spark, path, ["cat", "v"])
    assert sorted(
        r.k for r in index_lookup(spark, path, ["cat", "v"], ("a",)).collect()
    ) == [2]
    idx = read_keyed(spark, _index_path(path, ["cat", "v"]))
    assert idx.count() == 1, "retraction left a dead composite entry"
    # NULL -> value: row 1 re-enters
    write_keyed(
        spark.createDataFrame([(1, "a", 99)], "k int, cat string, v long"),
        path, "k", mode=SinkMode.APPEND,
    )
    refresh_index(spark, path, ["cat", "v"])
    assert sorted(
        r.k for r in index_lookup(spark, path, ["cat", "v"], ("a",)).collect()
    ) == [1, 2]
    assert [
        r.k for r in index_lookup(spark, path, ["cat", "v"], ("a", 99)).collect()
    ] == [1]


# ---------------------------------------------------------------------------
# encoding-version gate
# ---------------------------------------------------------------------------

def test_stale_encoding_refused_then_rebuilt(spark, tmp_path):
    """An index whose stamp predates the v2 encoding (or was written by
    an older engine) must refuse lookups — its stored keys would
    mis-range against a v2-encoded probe — and refresh_index resolves
    by full rebuild."""
    from cascading_hbase_spark.keyed.index import (
        StaleIndexError,
        _index_meta_commit,
        _index_path,
        create_index,
        index_lookup,
        index_range_lookup,
        refresh_index,
    )

    path, _ = _mk(spark, tmp_path, [(i, i) for i in range(8)], "k int, v long")
    create_index(spark, path, "v")

    def strip(info):
        info.pop("enc", None)

    _index_meta_commit(_index_path(path, "v"), strip)
    with pytest.raises(StaleIndexError, match="encoding"):
        index_lookup(spark, path, "v", 3, check_fresh=False)
    with pytest.raises(StaleIndexError, match="encoding"):
        index_range_lookup(spark, path, "v", 1, 2, check_fresh=False)
    refresh_index(spark, path, "v")  # rebuild resolves
    assert [r.k for r in index_lookup(spark, path, "v", 3).collect()] == [3]


def test_v3_encoded_index_refused_then_rebuilt(spark, tmp_path):
    """An index stamped enc=3 (rendered-string timestamps, CAST-string
    decimals) must refuse v4 lookups — a v4-encoded probe would
    mis-range against its stored keys — and refresh_index resolves by
    full rebuild, re-stamping v4."""
    from cascading_hbase_spark.keyed.index import (
        StaleIndexError,
        _index_meta_commit,
        _index_path,
        _load_meta,
        create_index,
        index_lookup,
        refresh_index,
    )

    path, _ = _mk(spark, tmp_path, [(i, i * 3) for i in range(8)], "k int, v long")
    create_index(spark, path, "v")

    def downgrade(info):
        info["enc"] = 3

    _index_meta_commit(_index_path(path, "v"), downgrade)
    with pytest.raises(StaleIndexError, match="v3"):
        index_lookup(spark, path, "v", 9, check_fresh=False)
    refresh_index(spark, path, "v")
    assert _load_meta(_index_path(path, "v"))["index_of"]["enc"] == 4
    assert [r.k for r in index_lookup(spark, path, "v", 9).collect()] == [3]


def test_include_reserved_and_duplicate_names_refused(spark, tmp_path):
    """include=["ref_key"/"idx_key"] (or a repeated entry) would put
    duplicate column names into the index select and corrupt the index
    schema — refused at create_index, same as for indexed columns
    (r12 ADVICE)."""
    from cascading_hbase_spark.keyed.index import create_index

    path, _ = _mk(
        spark, tmp_path,
        [(i, i * 3, f"p{i}", i, i) for i in range(4)],
        "k int, v long, p string, ref_key int, idx_key int",
    )
    with pytest.raises(ValueError, match="idx_key/ref_key"):
        create_index(spark, path, "v", include=["ref_key"])
    with pytest.raises(ValueError, match="idx_key/ref_key"):
        create_index(spark, path, "v", include=["idx_key"])
    with pytest.raises(ValueError, match="duplicate include"):
        create_index(spark, path, "v", include=["p", "p"])


def test_in_lookup_subsuming_prefixes_no_duplicates(spark, tmp_path):
    """For a composite index, a probe list where one tuple is a leading
    prefix of another (("A",) subsumes ("A", 5)) must not scan
    overlapping key ranges: the r12 ADVICE found the INDEX-ONLY path
    returned duplicate rows for keys matched by both scans.  The
    shorter prefix wins; row multiplicity matches the main table on
    both the covered and the semi-join path."""
    from cascading_hbase_spark.keyed.index import create_index, index_in_lookup

    rows = [(i, "A" if i % 2 == 0 else "B", i % 3) for i in range(12)]
    path, _ = _mk(spark, tmp_path, rows, "k int, p string, v long")
    create_index(spark, path, ["p", "v"])
    want = sorted(k for k, p, v in rows if p == "A")
    # covered (index-only) path: fields all in {key, indexed}
    got = index_in_lookup(
        spark, path, ["p", "v"], [("A",), ("A", 0)], fields=["k"]
    ).collect()
    assert sorted(r.k for r in got) == want, "covered path duplicated rows"
    # semi-join path (full rows)
    got = index_in_lookup(
        spark, path, ["p", "v"], [("A", 0), ("A",), ("B", 1)]
    ).collect()
    want2 = sorted(
        k for k, p, v in rows if p == "A" or (p == "B" and v == 1)
    )
    assert sorted(r.k for r in got) == want2


# ---------------------------------------------------------------------------
# range lookup == filter, fuzzed over mixed maintenance waves
# ---------------------------------------------------------------------------

@settings(max_examples=_examples(3), deadline=None)
@given(
    seed_vals=st.lists(
        st.integers(min_value=-100, max_value=100), min_size=1, max_size=12
    ),
    moves=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=-100, max_value=100),
        ),
        max_size=6,
    ),
    deletes=st.lists(st.integers(min_value=0, max_value=11), max_size=4),
    lo=st.integers(min_value=-110, max_value=110),
    width=st.integers(min_value=0, max_value=120),
)
@example(  # explore-fuzz falsifier (r12): duplicate delete keys popped
    # the MODEL twice (test bug, engine unaffected) — pinned
    seed_vals=[0], moves=[], deletes=[0, 0], lo=0, width=0,
)
@example(  # explore-fuzz falsifier (r12): two updates to one key in
    # ONE batch — the engine resolves in-batch duplicates by its total
    # LWW tie-break, not list order; the model now keeps one update
    # per key (test bug, engine behaves as documented) — pinned
    seed_vals=[0] * 8, moves=[(5, 3), (5, 0)], deletes=[], lo=0, width=0,
)
def test_range_lookup_model_property(spark_prop, tmp_path_factory,
                                     seed_vals, moves, deletes, lo, width):
    """Dict-model property: seed -> value-moving updates -> deletes ->
    incremental refresh -> range lookup ≡ model filter."""
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_range_lookup,
        refresh_index,
    )
    from cascading_hbase_spark.keyed.table import (
        SinkMode,
        delete_keyed,
        write_keyed,
    )

    spark = spark_prop
    path = str(tmp_path_factory.mktemp("idxprop") / "t")
    model = {i: v for i, v in enumerate(seed_vals)}
    write_keyed(
        spark.createDataFrame(list(model.items()), "k int, v long"),
        path, "k", retain=16,
    )
    create_index(spark, path, "v")
    # one update per key: in-batch duplicate keys are resolved by the
    # engine's total LWW tie-break, not list order — a separate,
    # separately-tested contract (test_keyed_table LWW tests)
    upd = list({k: (k, v) for k, v in moves if k in model}.values())
    if upd:
        for k, v in upd:
            model[k] = v
        write_keyed(
            spark.createDataFrame(upd, "k int, v long"),
            path, "k", mode=SinkMode.APPEND,
        )
    dels = sorted({k for k in deletes if k in model})
    if dels:
        for k in dels:
            model.pop(k)
        delete_keyed(
            spark, path,
            spark.createDataFrame([(k,) for k in set(dels)], "k int"),
        )
    refresh_index(spark, path, "v")
    hi = lo + width
    got = sorted(
        (r.k, r.v)
        for r in index_range_lookup(spark, path, "v", lo, hi).collect()
    )
    exp = sorted((k, v) for k, v in model.items() if lo <= v <= hi)
    assert got == exp


@pytest.fixture(scope="module")
def spark_prop(spark):
    return spark
