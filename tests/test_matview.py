"""Incremental materialized aggregate views: every refresh must leave
the view exactly equal to a from-scratch re-aggregate of the base —
under inserts, group-moving updates, deletes, and group extinction —
while reading only the changefeed, never the whole base."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cascading_hbase_spark.keyed.matview import (
    StaleViewError,
    create_aggregate_view,
    read_aggregate_view,
    refresh_aggregate_view,
)
from cascading_hbase_spark.keyed.table import (
    SinkMode,
    delete_keyed,
    read_keyed,
    write_keyed,
)


def _base_df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, grp string, val double")


def _expected(spark, base_path):
    return {
        (r["grp"], r["n_rows"], round(r["total"], 9))
        for r in read_keyed(spark, base_path)
        .groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.coalesce(F.col("val").cast("double"), F.lit(0.0))).alias(
                "total"
            ),
        )
        .collect()
    }


def _actual(spark, view_path):
    return {
        (r["grp"], r["n_rows"], round(r["total"], 9))
        for r in read_aggregate_view(spark, view_path).collect()
    }


def test_view_tracks_base_through_full_op_mix(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(
        _base_df(
            spark,
            [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "c", 4.0)],
        ),
        base,
        "id",
        retain=10,
    )
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    assert _actual(spark, view) == _expected(spark, base)

    # inserts + an update that MOVES a row between groups
    write_keyed(
        _base_df(spark, [(5, "b", 5.0), (3, "a", 30.0)]),
        base,
        "id",
        mode=SinkMode.APPEND,
    )
    assert refresh_aggregate_view(spark, base, view) is True
    assert _actual(spark, view) == _expected(spark, base)

    # delete every member of group c -> tombstone, filtered from reads
    delete_keyed(spark, base, spark.createDataFrame([(4,)], "id bigint"))
    assert refresh_aggregate_view(spark, base, view) is True
    assert _actual(spark, view) == _expected(spark, base)
    assert "c" not in {r["grp"] for r in read_aggregate_view(spark, view).collect()}

    # value-only update (group unchanged)
    write_keyed(
        _base_df(spark, [(1, "a", 100.0)]), base, "id", mode=SinkMode.APPEND
    )
    assert refresh_aggregate_view(spark, base, view) is True
    assert _actual(spark, view) == _expected(spark, base)


def test_refresh_is_noop_when_current(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(_base_df(spark, [(1, "a", 1.0)]), base, "id")
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    assert refresh_aggregate_view(spark, base, view) is False


def test_multi_refresh_batches_accumulate(spark, tmp_path):
    """Several base commits between refreshes collapse into one delta;
    several refreshes in sequence each apply exactly once."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(_base_df(spark, [(1, "a", 1.0)]), base, "id", retain=20)
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    for i in range(2, 8):
        write_keyed(
            _base_df(spark, [(i, "a" if i % 2 else "b", float(i))]),
            base,
            "id",
            mode=SinkMode.APPEND,
        )
        if i % 3 == 0:  # refresh only sometimes: deltas must accumulate
            assert refresh_aggregate_view(spark, base, view) is True
    refresh_aggregate_view(spark, base, view)
    assert _actual(spark, view) == _expected(spark, base)


def test_stale_cursor_raises(spark, tmp_path):
    """If the base GC'd the cursor generation (refresh lag > retain),
    refresh must refuse loudly rather than corrupt the view."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(_base_df(spark, [(1, "a", 1.0)]), base, "id")  # retain=2
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    for i in range(2, 7):
        write_keyed(
            _base_df(spark, [(i, "a", float(i))]),
            base,
            "id",
            mode=SinkMode.APPEND,
        )
    with pytest.raises(StaleViewError):
        refresh_aggregate_view(spark, base, view)
    # rebuild recovers
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    assert _actual(spark, view) == _expected(spark, base)


def test_replaced_base_raises_stale(spark, tmp_path):
    """REPLACE restarts the base's version counter; a refresh against
    the new incarnation must raise StaleViewError — both when the new
    table's version reaches the cursor (which would otherwise read as
    'already current') and when it passes it (which would otherwise
    diff two unrelated histories)."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(_base_df(spark, [(1, "a", 1.0)]), base, "id", retain=10)
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    # new incarnation at the SAME version as the cursor (1)
    write_keyed(
        _base_df(spark, [(9, "z", 9.0)]), base, "id", mode=SinkMode.REPLACE
    )
    with pytest.raises(StaleViewError):
        refresh_aggregate_view(spark, base, view)
    # and PAST the cursor
    write_keyed(
        _base_df(spark, [(10, "z", 1.0)]), base, "id", mode=SinkMode.APPEND
    )
    with pytest.raises(StaleViewError):
        refresh_aggregate_view(spark, base, view)
    # rebuild recovers against the new incarnation
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    assert _actual(spark, view) == _expected(spark, base)


def test_pre_base_id_view_always_raises_rebuild_signal(spark, tmp_path):
    """A view created before the base_id stamp existed (no 'base_id' in
    its matview meta) must raise the rebuild signal EVEN when its
    cursor equals the base version: version-count equality cannot
    prove lineage — a REPLACEd base whose new incarnation's count
    happens to reach the cursor would otherwise adopt a stale view as
    current and stamp the wrong incarnation (r10 ADVICE; supersedes
    the r09 stamp-when-current rule).  Rebuild is one-time thanks to
    the every-commit table_id backfill."""
    import os

    from cascading_hbase_spark.keyed.controlplane import get_control_plane

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(_base_df(spark, [(1, "a", 1.0)]), base, "id", retain=10)
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    # devolve: strip the stamp, as a pre-upgrade view on disk would be.
    # Manipulate the meta through the control plane (not raw open()) so
    # the scenario is valid under KT_PLANE=objectstore too.
    cp = get_control_plane()
    mp = os.path.join(view, "_kt_meta.json")
    meta = cp.read_json(mp)
    meta["matview"].pop("base_id", None)
    cp.write_json_atomic(mp, meta)
    # cursor == base version is NOT adopted: rebuild signal
    with pytest.raises(StaleViewError, match="predates incarnation"):
        refresh_aggregate_view(spark, base, view)
    # rebuild stamps; the view then refreshes normally
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    from cascading_hbase_spark.keyed.table import _load_meta

    assert (
        cp.read_json(mp)["matview"]["base_id"]
        == _load_meta(base).get("table_id")
    )
    write_keyed(
        _base_df(spark, [(2, "a", 2.0)]), base, "id", mode=SinkMode.APPEND
    )
    assert refresh_aggregate_view(spark, base, view) is True
    assert _actual(spark, view) == _expected(spark, base)
    # devolve AGAIN while behind: same rebuild signal
    meta = cp.read_json(mp)
    meta["matview"].pop("base_id", None)
    cp.write_json_atomic(mp, meta)
    write_keyed(
        _base_df(spark, [(3, "b", 3.0)]), base, "id", mode=SinkMode.APPEND
    )
    with pytest.raises(StaleViewError, match="predates incarnation"):
        refresh_aggregate_view(spark, base, view)
    # rebuild is the documented recovery
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    assert _actual(spark, view) == _expected(spark, base)
    # and the armed guard now catches a real replacement
    write_keyed(
        _base_df(spark, [(9, "z", 9.0)]), base, "id", mode=SinkMode.REPLACE
    )
    write_keyed(
        _base_df(spark, [(10, "z", 1.0)]), base, "id", mode=SinkMode.APPEND
    )
    with pytest.raises(StaleViewError):
        refresh_aggregate_view(spark, base, view)


def test_vacuumed_cursor_raises_stale(spark, tmp_path):
    """A cursor below the base's vacuum horizon must surface as the
    documented StaleViewError rebuild signal, not a FileNotFoundError
    from inside the changefeed diff (mirror of sync_replica's gate)."""
    from cascading_hbase_spark.keyed.table import vacuum_keyed

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(_base_df(spark, [(1, "a", 1.0)]), base, "id", retain=10)
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    for i in range(2, 5):
        write_keyed(
            _base_df(spark, [(i, "a", float(i))]),
            base,
            "id",
            mode=SinkMode.APPEND,
        )
    vacuum_keyed(base, retain=1)  # horizon now > cursor, policy untouched
    with pytest.raises(StaleViewError):
        refresh_aggregate_view(spark, base, view)
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    assert _actual(spark, view) == _expected(spark, base)


def test_count_only_view(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(
        _base_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), base, "id", retain=10
    )
    create_aggregate_view(spark, base, view, "grp")
    write_keyed(
        _base_df(spark, [(3, "b", 9.0)]), base, "id", mode=SinkMode.APPEND
    )
    refresh_aggregate_view(spark, base, view)
    got = {
        (r["grp"], r["n_rows"])
        for r in read_aggregate_view(spark, view).collect()
    }
    assert got == {("a", 1), ("b", 2)}


def _expected_ext(spark, base_path):
    return {
        (
            r["grp"], r["n_rows"],
            round(r["total"], 9), r["lo"], r["hi"],
        )
        for r in read_keyed(spark, base_path)
        .groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.coalesce(F.col("val").cast("double"), F.lit(0.0))).alias("total"),
            F.min(F.col("val").cast("double")).alias("lo"),
            F.max(F.col("val").cast("double")).alias("hi"),
        )
        .collect()
    }


def _actual_ext(spark, view_path):
    return {
        (r["grp"], r["n_rows"], round(r["total"], 9), r["lo"], r["hi"])
        for r in read_aggregate_view(spark, view_path).collect()
    }


def test_min_max_view_tracks_base(spark, tmp_path):
    """MIN/MAX maintenance: inserts maintain incrementally; retracting
    the extremum re-aggregates only that group from the base (the
    hybrid contract, VERDICT r03 item 6)."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(
        _base_df(
            spark,
            [(1, "a", 5.0), (2, "a", 2.0), (3, "b", 3.0), (4, "b", 7.0)],
        ),
        base, "id", retain=20,
    )
    create_aggregate_view(
        spark, base, view, "grp", {"total": "val"},
        mins={"lo": "val"}, maxs={"hi": "val"},
    )
    assert _actual_ext(spark, view) == _expected_ext(spark, base)

    # insert a new global min for a (incremental path, no rescan)
    write_keyed(_base_df(spark, [(5, "a", 0.5)]), base, "id", mode=SinkMode.APPEND)
    refresh_aggregate_view(spark, base, view)
    assert _actual_ext(spark, view) == _expected_ext(spark, base)

    # delete a NON-extremum of a: min/max must survive unchanged
    delete_keyed(spark, base, spark.createDataFrame([(2,)], "id bigint"))
    refresh_aggregate_view(spark, base, view)
    assert _actual_ext(spark, view) == _expected_ext(spark, base)

    # delete a's MIN (0.5): forces the per-group rescan to find 5.0
    delete_keyed(spark, base, spark.createDataFrame([(5,)], "id bigint"))
    refresh_aggregate_view(spark, base, view)
    assert _actual_ext(spark, view) == _expected_ext(spark, base)

    # update moves b's MAX row into group a: both groups re-derive
    write_keyed(_base_df(spark, [(4, "a", 7.0)]), base, "id", mode=SinkMode.APPEND)
    refresh_aggregate_view(spark, base, view)
    assert _actual_ext(spark, view) == _expected_ext(spark, base)

    # group extinction: delete every remaining member of b
    delete_keyed(spark, base, spark.createDataFrame([(3,)], "id bigint"))
    refresh_aggregate_view(spark, base, view)
    assert _actual_ext(spark, view) == _expected_ext(spark, base)
    assert "b" not in {r["grp"] for r in read_aggregate_view(spark, view).collect()}


def test_duplicate_agg_names_rejected(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(_base_df(spark, [(1, "a", 1.0)]), base, "id")
    with pytest.raises(ValueError, match="unique"):
        create_aggregate_view(
            spark, base, view, "grp", {"x": "val"}, mins={"x": "val"}
        )


def test_min_max_view_with_null_values(spark, tmp_path):
    """NULL source values never count toward MIN/MAX (SQL semantics):
    inserting NULLs leaves extrema alone, retracting a NULL never
    triggers a rescan, and a group holding only NULLs reports NULL
    extrema while n_rows still counts the rows."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(
        _base_df(spark, [(1, "a", 5.0), (2, "a", None), (3, "b", None)]),
        base, "id", retain=20,
    )
    create_aggregate_view(
        spark, base, view, "grp", {"total": "val"},
        mins={"lo": "val"}, maxs={"hi": "val"},
    )
    assert _actual_ext(spark, view) == _expected_ext(spark, base)

    # retract the NULL row of a: extrema unchanged, no false rescan
    delete_keyed(spark, base, spark.createDataFrame([(2,)], "id bigint"))
    refresh_aggregate_view(spark, base, view)
    assert _actual_ext(spark, view) == _expected_ext(spark, base)

    # insert a NULL into all-NULL group b, then a real value
    write_keyed(_base_df(spark, [(4, "b", None)]), base, "id", mode=SinkMode.APPEND)
    refresh_aggregate_view(spark, base, view)
    assert _actual_ext(spark, view) == _expected_ext(spark, base)
    write_keyed(_base_df(spark, [(5, "b", 2.5)]), base, "id", mode=SinkMode.APPEND)
    refresh_aggregate_view(spark, base, view)
    assert _actual_ext(spark, view) == _expected_ext(spark, base)


def test_reserved_agg_names_rejected(spark, tmp_path):
    """Underscore-leading outputs collide with refresh internals (_dn,
    _rescan, _cur_*...) — refused at create time, not first refresh."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(_base_df(spark, [(1, "a", 1.0)]), base, "id")
    with pytest.raises(ValueError, match="reserved"):
        create_aggregate_view(spark, base, view, "grp", {"_dn": "val"})


def test_view_over_version_token_rejected_at_create(spark, tmp_path):
    """An aggregate over the base's registered version-token column can
    never be maintained incrementally (token-only rewrites are
    invisible to the changefeed by contract) — creation refuses
    (review finding: the view silently diverged from a recompute)."""
    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    write_keyed(
        spark.createDataFrame(
            [(1, "a", 1.0, 0)], "id bigint, grp string, val double, seq long"
        ),
        base, "id", seq_col="seq",
    )
    for kwargs in [
        {"maxs": {"last_seq": "seq"}},
        {"sums": {"s": "seq"}},
        {"mins": {"m": "seq"}},
    ]:
        with pytest.raises(ValueError, match="version-token"):
            create_aggregate_view(spark, base, view, "grp", **kwargs)
    with pytest.raises(ValueError, match="version-token"):
        create_aggregate_view(spark, base, view, "seq", sums={"s": "val"})


def test_view_over_late_registered_token_rejected_at_refresh(spark, tmp_path):
    """The registration can land AFTER the view exists; the next
    refresh must refuse rather than silently diverge."""
    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    write_keyed(
        spark.createDataFrame(
            [(1, "a", 1.0, 0)], "id bigint, grp string, val double, seq long"
        ),
        base, "id",
    )
    create_aggregate_view(spark, base, view, "grp", maxs={"last_seq": "seq"})
    # registration lands after creation, plus a data change to refresh
    write_keyed(
        spark.createDataFrame(
            [(2, "a", 2.0, 1)], "id bigint, grp string, val double, seq long"
        ),
        base, "id", seq_col="seq",
    )
    with pytest.raises(ValueError, match="version-token"):
        refresh_aggregate_view(spark, base, view)


# ---------------------------------------------------------------------------
# r11 dtype contract: integral sources -> BIGINT accumulators (exact past
# 2^53, where the old all-double path silently lost integer exactness)
# ---------------------------------------------------------------------------


def _int_df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, grp string, cents bigint")


def _long_fields(df, names):
    from pyspark.sql.types import LongType

    return {
        f.name: isinstance(f.dataType, LongType)
        for f in df.schema.fields
        if f.name in names
    }


def test_integral_view_is_bigint_through_create_and_refresh(spark, tmp_path):
    """SUM/MIN/MAX over a bigint source come back as bigint from create
    AND stay bigint through every refresh shape — insert, group-moving
    update, delete that forces the extrema rescan."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(
        _int_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 7)]),
        base, "id", retain=10,
    )
    create_aggregate_view(
        spark, base, view, "grp", {"total": "cents"},
        mins={"lo": "cents"}, maxs={"hi": "cents"},
    )
    got = read_aggregate_view(spark, view)
    assert _long_fields(got, {"total", "lo", "hi", "n_rows"}) == {
        "total": True, "lo": True, "hi": True, "n_rows": True,
    }
    # insert + group-move update + delete-the-max (extrema rescan path)
    write_keyed(
        _int_df(spark, [(4, "b", 100), (1, "b", 11)]),
        base, "id", mode=SinkMode.APPEND,
    )
    assert refresh_aggregate_view(spark, base, view) is True
    delete_keyed(spark, base, spark.createDataFrame([(4,)], "id bigint"))
    assert refresh_aggregate_view(spark, base, view) is True
    got = read_aggregate_view(spark, view)
    assert _long_fields(got, {"total", "lo", "hi"}) == {
        "total": True, "lo": True, "hi": True,
    }
    want = {
        (r["grp"], r["n_rows"], r["total"], r["lo"], r["hi"])
        for r in read_keyed(spark, base)
        .groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("cents").alias("total"),
            F.min("cents").alias("lo"),
            F.max("cents").alias("hi"),
        )
        .collect()
    }
    assert {
        (r["grp"], r["n_rows"], r["total"], r["lo"], r["hi"])
        for r in got.collect()
    } == want


def test_integral_sum_exact_past_2_to_53(spark, tmp_path):
    """The reason the contract exists: (2^53 + 1) is not representable
    as a double, so the old double accumulator would drop the +1 at
    create time and again per refresh.  The long accumulator must not."""
    big = (1 << 53) + 1
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(
        _int_df(spark, [(1, "a", big), (2, "a", 1)]), base, "id", retain=10
    )
    create_aggregate_view(spark, base, view, "grp", {"total": "cents"})
    [r] = read_aggregate_view(spark, view).collect()
    assert r["total"] == big + 1  # double path would say 2^53 + 1
    write_keyed(
        _int_df(spark, [(3, "a", big)]), base, "id", mode=SinkMode.APPEND
    )
    assert refresh_aggregate_view(spark, base, view) is True
    [r] = read_aggregate_view(spark, view).collect()
    assert r["total"] == 2 * big + 1  # exact through the delta merge too


def test_mixed_sources_pin_per_output_dtype(spark, tmp_path):
    """One view, one integral + one floating SUM: each output keeps its
    own accumulator dtype (per-output "acc" pin, not view-global)."""
    from pyspark.sql.types import DoubleType, LongType

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(
        spark.createDataFrame(
            [(1, "a", 10, 1.5), (2, "a", 20, 2.5)],
            "id bigint, grp string, cents bigint, val double",
        ),
        base, "id", retain=10,
    )
    create_aggregate_view(
        spark, base, view, "grp", {"cents_total": "cents", "val_total": "val"}
    )
    types = {
        f.name: type(f.dataType)
        for f in read_aggregate_view(spark, view).schema.fields
    }
    assert types["cents_total"] is LongType
    assert types["val_total"] is DoubleType
    write_keyed(
        spark.createDataFrame(
            [(3, "a", 5, 0.5)],
            "id bigint, grp string, cents bigint, val double",
        ),
        base, "id", mode=SinkMode.APPEND,
    )
    refresh_aggregate_view(spark, base, view)
    [r] = read_aggregate_view(spark, view).collect()
    assert (r["cents_total"], r["val_total"]) == (35, 4.5)
    types = {
        f.name: type(f.dataType)
        for f in read_aggregate_view(spark, view).schema.fields
    }
    assert types["cents_total"] is LongType
    assert types["val_total"] is DoubleType


def test_pre_r11_view_without_acc_stays_double(spark, tmp_path, monkeypatch):
    """A view created before the dtype contract has all-double data and
    no "acc" manifest entry; refresh must keep serving the schema the
    view was created with, not coerce it to the new rule."""
    import cascading_hbase_spark.keyed.matview as mv_mod
    from pyspark.sql.types import DoubleType

    from cascading_hbase_spark.keyed.table import _load_meta, _save_meta

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    write_keyed(
        _int_df(spark, [(1, "a", 10), (2, "b", 20)]), base, "id", retain=10
    )
    # simulate the pre-r11 creator: double accumulators, no "acc" pin
    monkeypatch.setattr(mv_mod, "_acc_type", lambda df, src: "double")
    create_aggregate_view(
        spark, base, view, "grp", {"total": "cents"}, maxs={"hi": "cents"}
    )
    monkeypatch.undo()
    meta = _load_meta(view)
    meta["matview"].pop("acc")
    _save_meta(view, meta)
    write_keyed(
        _int_df(spark, [(3, "a", 5)]), base, "id", mode=SinkMode.APPEND
    )
    assert refresh_aggregate_view(spark, base, view) is True
    got = read_aggregate_view(spark, view)
    types = {f.name: type(f.dataType) for f in got.schema.fields}
    assert types["total"] is DoubleType and types["hi"] is DoubleType
    assert {(r["grp"], r["total"], r["hi"]) for r in got.collect()} == {
        ("a", 15.0, 10.0), ("b", 20.0, 20.0),
    }


# ---------------------------------------------------------------------------
# apply_sum_delta (r11): the engine half of stream_matview — one
# changefeed micro-batch folded into a COUNT/SUM view, exactly once
# per (checkpoint, batch_id)
# ---------------------------------------------------------------------------


def test_apply_sum_delta_replay_is_noop_and_next_batch_applies(
    spark, tmp_path
):
    """SUM deltas are not idempotent, so replay safety is the stamp:
    re-applying the SAME (checkpoint, batch_id) returns False and
    changes nothing; the NEXT batch id applies; a FOREIGN checkpoint
    raises instead of guessing."""
    from cascading_hbase_spark.keyed.matview import apply_sum_delta
    from cascading_hbase_spark.keyed.table import changefeed_keyed

    base = str(tmp_path / "b")
    view = str(tmp_path / "v")
    write_keyed(
        _base_df(spark, [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)]),
        base, "id", retain=10,
    )                                                                  # v1
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    write_keyed(_base_df(spark, [(2, "a", 25.0), (4, "b", 7.0)]),
                base, "id", mode=SinkMode.APPEND)                      # v2
    feed = changefeed_keyed(spark, base, 1, to_generation=2,
                            include_old=True)
    assert apply_sum_delta(spark, view, feed, "ckpt-A", 0) is True
    want = {("a", 2, 35.0), ("b", 2, 12.0)}

    def _got():
        return {
            (r["grp"], r["n_rows"], r["total"])
            for r in read_aggregate_view(spark, view).collect()
        }

    assert _got() == want
    # crash-replay of the stamped batch: recognized, nothing applied
    assert apply_sum_delta(spark, view, feed, "ckpt-A", 0) is False
    assert _got() == want
    # the next batch id applies normally
    delete_keyed(spark, base,
                 spark.createDataFrame([(1,)], "id bigint"))           # v3
    feed2 = changefeed_keyed(spark, base, 2, to_generation=3,
                             include_old=True)
    assert apply_sum_delta(spark, view, feed2, "ckpt-A", 1) is True
    assert _got() == {("a", 1, 25.0), ("b", 2, 12.0)}
    # a foreign checkpoint's batch numbering proves nothing: refuse
    with pytest.raises(StaleViewError, match="different|maintained under"):
        apply_sum_delta(spark, view, feed2, "ckpt-B", 0)


def test_refresh_refused_on_stream_maintained_view(spark, tmp_path):
    """Once a stream batch landed, the manifest cursor is stale BY
    DESIGN (the checkpoint is the authority) — a scheduled refresh
    diffing from it would double-apply; it must refuse loudly."""
    from cascading_hbase_spark.keyed.matview import apply_sum_delta
    from cascading_hbase_spark.keyed.table import changefeed_keyed

    base = str(tmp_path / "b")
    view = str(tmp_path / "v")
    write_keyed(_base_df(spark, [(1, "a", 1.0)]), base, "id", retain=10)
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    write_keyed(_base_df(spark, [(2, "a", 2.0)]), base, "id",
                mode=SinkMode.APPEND)
    apply_sum_delta(
        spark, view,
        changefeed_keyed(spark, base, 1, to_generation=2, include_old=True),
        "ckpt", 0,
    )
    with pytest.raises(StaleViewError, match="stream-maintained"):
        refresh_aggregate_view(spark, base, view)


def test_apply_sum_delta_refuses_extrema_view(spark, tmp_path):
    """MIN/MAX retraction needs a group rescan pinned to the diff's end
    snapshot, which a stream batch cannot name — refused."""
    from cascading_hbase_spark.keyed.matview import apply_sum_delta
    from cascading_hbase_spark.keyed.table import changefeed_keyed

    base = str(tmp_path / "b")
    view = str(tmp_path / "v")
    write_keyed(_base_df(spark, [(1, "a", 1.0)]), base, "id", retain=10)
    create_aggregate_view(
        spark, base, view, "grp", {"total": "val"}, mins={"lo": "val"}
    )
    write_keyed(_base_df(spark, [(2, "a", 2.0)]), base, "id",
                mode=SinkMode.APPEND)
    feed = changefeed_keyed(spark, base, 1, to_generation=2,
                            include_old=True)
    with pytest.raises(ValueError, match="MIN/MAX"):
        apply_sum_delta(spark, view, feed, "ckpt", 0)
