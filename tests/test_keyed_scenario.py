"""Maintenance-day integration scenario: the keyed layer's features
composed in one lifecycle — append, index, matview, delete, TTL,
re-bucketing compaction — checked against a plain dict model after
every step.  Each feature has its own unit/property tests; this pins
the INTERACTIONS (e.g. a refresh after a delete+TTL+compact sequence
must still apply exactly one delta)."""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from cascading_hbase_spark.keyed.index import (
    StaleIndexError,
    create_index,
    index_lookup,
    refresh_index,
)
from cascading_hbase_spark.keyed.matview import (
    create_aggregate_view,
    read_aggregate_view,
    refresh_aggregate_view,
)
from cascading_hbase_spark.keyed.replica import create_replica, sync_replica
from cascading_hbase_spark.keyed.table import (
    SinkMode,
    compact_keyed,
    delete_keyed,
    list_generations,
    read_keyed,
    set_ttl,
    write_keyed,
)

COLS = "k long, grp string, amount double, ts double"


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _check(spark, path, model):
    got = {
        r.k: (r.grp, r.amount, r.ts)
        for r in read_keyed(spark, path).collect()
    }
    assert got == model, f"table drifted: extra={got.keys() - model.keys()} missing={model.keys() - got.keys()}"


def _check_view(spark, vpath, model):
    expect = {}
    for grp, amount, _ts in model.values():
        n, s = expect.get(grp, (0, 0.0))
        expect[grp] = (n + 1, s + amount)
    got = {
        r.grp: (r.n_rows, round(r.amount_sum, 6))
        for r in read_aggregate_view(spark, vpath).collect()
    }
    assert got == {g: (n, round(s, 6)) for g, (n, s) in expect.items()}


def test_maintenance_day(spark, tmp_path):
    path = str(tmp_path / "t")
    vpath = str(tmp_path / "v")
    now = time.time()
    old = now - 10_000  # will fall outside the TTL window
    model: dict[int, tuple] = {}

    # 1. initial load: keys 0..59, first 10 with old timestamps
    rows = [
        (k, f"g{k % 3}", float(k), old if k < 10 else now)
        for k in range(60)
    ]
    write_keyed(_df(spark, rows), path, "k", mode=SinkMode.APPEND)
    model = {r[0]: (r[1], r[2], r[3]) for r in rows}
    _check(spark, path, model)

    # 2. index + matview + replica on the loaded snapshot
    rpath = str(tmp_path / "r")
    create_index(spark, path, "grp")
    create_aggregate_view(spark, path, vpath, "grp", sums={"amount_sum": "amount"})
    create_replica(spark, path, rpath)

    def _sync():
        sync_replica(spark, path, rpath)
        want = sorted(tuple(r) for r in read_keyed(spark, path).collect())
        got = sorted(tuple(r) for r in read_keyed(spark, rpath).collect())
        assert got == want, "replica diverged from primary"

    _check_view(spark, vpath, model)
    assert index_lookup(spark, path, "grp", "g1").count() == sum(
        1 for g, _, _ in model.values() if g == "g1"
    )

    # 3. upsert wave: keys 40..79 change group and amount
    rows2 = [(k, f"h{k % 2}", k * 2.0, now) for k in range(40, 80)]
    write_keyed(_df(spark, rows2), path, "k", mode=SinkMode.APPEND)
    for r in rows2:
        model[r[0]] = (r[1], r[2], r[3])
    _check(spark, path, model)

    # the index must refuse silently-stale answers, then recover
    with pytest.raises(StaleIndexError):
        index_lookup(spark, path, "grp", "g1")
    refresh_index(spark, path, "grp")
    assert index_lookup(spark, path, "grp", "h0").count() == sum(
        1 for g, _, _ in model.values() if g == "h0"
    )

    # incremental refresh applies exactly the upsert delta
    refresh_aggregate_view(spark, path, vpath)
    _check_view(spark, vpath, model)
    _sync()

    # 3b. expectations-gated ingest wave: a dirty batch (negative
    #     amounts, empty groups) arrives; only clean rows reach the
    #     table, rejects land tagged in quarantine, and the
    #     view/replica apply exactly the clean delta
    from cascading_hbase_spark.keyed.expectations import (
        Expectation,
        write_keyed_validated,
    )

    qdir = str(tmp_path / "quarantine")
    dirty = [
        (80, "g0", 5.0, now),       # clean
        (81, "", 6.0, now),         # empty group
        (82, "g1", -1.0, now),      # negative amount
        (83, "", -2.0, now),        # both
        (84, "g2", 7.0, now),       # clean
    ]
    write_keyed_validated(
        _df(spark, dirty), path, "k",
        [Expectation("grp_nonempty", "grp <> ''"),
         Expectation("amount_nonneg", "amount >= 0.0")],
        quarantine_path=qdir,
    )
    for r in dirty:
        if r[1] and r[2] >= 0.0:
            model[r[0]] = (r[1], r[2], r[3])
    _check(spark, path, model)
    q = {r.k: sorted(r._violated) for r in spark.read.parquet(qdir).collect()}
    assert q == {
        81: ["grp_nonempty"],
        82: ["amount_nonneg"],
        83: ["amount_nonneg", "grp_nonempty"],
    }
    refresh_aggregate_view(spark, path, vpath)
    _check_view(spark, vpath, model)
    _sync()

    # 4. delete every 7th key; refresh applies the delete delta
    dels = [k for k in model if k % 7 == 0]
    delete_keyed(spark, path, _df(spark, [(k, "", 0.0, 0.0) for k in dels]).select("k"))
    for k in dels:
        del model[k]
    _check(spark, path, model)
    refresh_aggregate_view(spark, path, vpath)
    _check_view(spark, vpath, model)
    _sync()

    # 5. TTL: the untouched old-ts rows (k<10 minus deleted/upserted)
    #    vanish from reads; the changefeed sees them as deletions, so
    #    the refresh subtracts them from the aggregates
    set_ttl(path, "ts", 3_600)
    model = {k: v for k, v in model.items() if v[2] > now - 3_600}
    _check(spark, path, model)
    refresh_aggregate_view(spark, path, vpath)
    _check_view(spark, vpath, model)
    _sync()  # TTL expirations arrive at the replica as deletes

    # 6. re-bucketing major compaction: purges TTL'd + deleted rows,
    #    resamples boundaries; reads identical and the refresh delta is
    #    empty
    compact_keyed(spark, path, n_buckets=4)
    _check(spark, path, model)
    refresh_aggregate_view(spark, path, vpath)
    _check_view(spark, vpath, model)
    _sync()  # compaction = physical-only change; the sync delta is empty

    # 8. the table kept committing throughout: generations are monotone
    #    and the latest is readable via explicit pin
    gens = list_generations(path)
    assert gens == sorted(gens) and len(gens) >= 2
    pinned = read_keyed(spark, path, generation=gens[-1])
    assert pinned.count() == len(model)

    # 9. one more upsert after the full maintenance pass — the stack
    #    still behaves (no stale caches, no orphaned state)
    rows3 = [(k, "z", 1.0, now) for k in range(0, 5)]
    write_keyed(_df(spark, rows3), path, "k", mode=SinkMode.APPEND)
    for r in rows3:
        model[r[0]] = (r[1], r[2], r[3])
    _check(spark, path, model)
    refresh_aggregate_view(spark, path, vpath)
    _check_view(spark, vpath, model)
    _sync()

    # 10. a view left unrefreshed past the retain window must refuse a
    #     silently-wrong incremental refresh and demand a rebuild — the
    #     documented recovery path
    from cascading_hbase_spark.keyed.matview import StaleViewError

    for k in (100, 101, 102):
        write_keyed(_df(spark, [(k, "z", 1.0, now)]), path, "k", mode=SinkMode.APPEND)
        model[k] = ("z", 1.0, now)
    with pytest.raises(StaleViewError):
        refresh_aggregate_view(spark, path, vpath)
    create_aggregate_view(spark, path, vpath, "grp", sums={"amount_sum": "amount"})
    _check_view(spark, vpath, model)
