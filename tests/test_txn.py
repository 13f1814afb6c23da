"""Multi-table atomic commit (keyed/txn.py): an ingest + replica-sync
+ matview-refresh chain flips all three manifests in one transaction —
all-or-nothing outcome, crash-healed flips, abort leaves every table
untouched.  Plane-portable: all manifest manipulation goes through the
control plane."""

from __future__ import annotations

import pytest

from cascading_hbase_spark.keyed.controlplane import (
    ConcurrentWriteError,
    get_control_plane,
)
from cascading_hbase_spark.keyed.matview import (
    create_aggregate_view,
    refresh_aggregate_view,
)
from cascading_hbase_spark.keyed.replica import create_replica, sync_replica
from cascading_hbase_spark.keyed.table import (
    SinkMode,
    read_keyed,
    write_keyed,
)
from cascading_hbase_spark.keyed.txn import (
    TxnCommittedError,
    default_txn_log,
    multi_commit,
    recover_multi_commit,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, val double")


def _versions(paths):
    cp = get_control_plane()
    return [
        cp.read_json(p.rstrip("/") + "/_kt_meta.json").get("version")
        for p in paths
    ]


@pytest.fixture
def chain(spark, tmp_path):
    """primary -> replica -> matview, all current at version 1/1/1."""
    primary = str(tmp_path / "primary")
    replica = str(tmp_path / "replica")
    view = str(tmp_path / "view")
    write_keyed(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), primary, "id", retain=10
    )
    create_replica(spark, primary, replica)
    create_aggregate_view(spark, replica, view, "grp", {"total": "val"})
    return primary, replica, view


def _totals(spark, view):
    from cascading_hbase_spark.keyed.matview import read_aggregate_view

    return {
        r.grp: r.total for r in read_aggregate_view(spark, view).collect()
    }


def test_chain_commits_atomically_and_cleans_log(spark, chain):
    primary, replica, view = chain
    paths = [primary, replica, view]
    before = _versions(paths)
    with multi_commit(paths):
        write_keyed(
            _df(spark, [(3, "a", 10.0)]), primary, "id",
            mode=SinkMode.APPEND,
        )
        assert sync_replica(spark, primary, replica) is True
        assert refresh_aggregate_view(spark, replica, view) is True
    # all three advanced, chain state consistent, txn doc gone
    assert _versions(paths) == [v + 1 for v in before]
    assert read_keyed(spark, replica).count() == 3
    assert _totals(spark, view) == {"a": 11.0, "b": 2.0}
    assert not get_control_plane().object_exists(default_txn_log(paths))


def test_abort_flips_nothing(spark, chain):
    primary, replica, view = chain
    paths = [primary, replica, view]
    before = _versions(paths)
    with pytest.raises(RuntimeError, match="chain failure"):
        with multi_commit(paths):
            write_keyed(
                _df(spark, [(3, "a", 10.0)]), primary, "id",
                mode=SinkMode.APPEND,
            )
            sync_replica(spark, primary, replica)
            raise RuntimeError("chain failure")
    assert _versions(paths) == before
    assert read_keyed(spark, primary).count() == 2
    assert read_keyed(spark, replica).count() == 2
    # the chain is re-runnable after the abort
    with multi_commit(paths):
        write_keyed(
            _df(spark, [(3, "a", 10.0)]), primary, "id",
            mode=SinkMode.APPEND,
        )
        sync_replica(spark, primary, replica)
        refresh_aggregate_view(spark, replica, view)
    assert read_keyed(spark, replica).count() == 3
    assert _totals(spark, view) == {"a": 11.0, "b": 2.0}


def test_crash_mid_flip_is_healed_by_recovery(spark, chain, monkeypatch):
    """A crash between the decision write and the last pointer flip
    leaves the transaction document; recovery completes the remaining
    flips idempotently (already-flipped tables are skipped)."""
    primary, replica, view = chain
    paths = [primary, replica, view]
    inner = get_control_plane()
    log = default_txn_log(paths)
    view_meta = view.rstrip("/") + "/_kt_meta.json"
    real_write = inner.write_json_atomic

    def crashing(key, obj):
        if key == view_meta:
            raise OSError("simulated crash before the view's flip")
        real_write(key, obj)

    monkeypatch.setattr(inner, "write_json_atomic", crashing)
    # post-decision failure surfaces as committed-pending-recovery,
    # never as a bare error a caller could misread as an abort (r10
    # ADVICE); the underlying cause stays in the message and __cause__
    with pytest.raises(TxnCommittedError, match="simulated crash"):
        with multi_commit(paths):
            write_keyed(
                _df(spark, [(3, "a", 10.0)]), primary, "id",
                mode=SinkMode.APPEND,
            )
            sync_replica(spark, primary, replica)
            refresh_aggregate_view(spark, replica, view)
    monkeypatch.undo()
    # decided: the txn doc exists; primary+replica flipped, view stale
    assert inner.object_exists(log)
    pv, rv, vv = _versions(paths)
    assert (pv, rv) == (2, 2) and vv == 1
    assert recover_multi_commit(log) is True
    assert _versions(paths) == [2, 2, 2]
    assert _totals(spark, view) == {"a": 11.0, "b": 2.0}
    assert not inner.object_exists(log)
    # and the next multi_commit on the same log would have healed too
    assert recover_multi_commit(log) is False


def test_concurrent_advance_aborts_preflight(spark, chain):
    """A table that moves under the transaction (another writer's
    commit between staging and decision) aborts the whole transaction
    before anything is decided or flipped."""
    primary, replica, view = chain
    paths = [primary, replica, view]
    with pytest.raises(ConcurrentWriteError, match="advanced"):
        with multi_commit(paths):
            write_keyed(
                _df(spark, [(3, "a", 10.0)]), primary, "id",
                mode=SinkMode.APPEND,
            )
            # an out-of-band writer sneaks a commit onto the replica
            # while its sync is still staged
            sync_replica(spark, primary, replica)
            inner_cp = get_control_plane()
            from cascading_hbase_spark.keyed.txn import _TxnControlPlane

            assert isinstance(inner_cp, _TxnControlPlane)
            from cascading_hbase_spark.keyed.controlplane import (
                use_control_plane,
            )

            with use_control_plane(inner_cp._inner):
                write_keyed(
                    _df(spark, [(9, "z", 9.0)]), replica, "id",
                    mode=SinkMode.APPEND,
                )
    # nothing from the transaction landed; the out-of-band write did
    assert not get_control_plane().object_exists(default_txn_log(paths))
    assert read_keyed(spark, primary).count() == 2
    assert {r.id for r in read_keyed(spark, replica).collect()} == {1, 2, 9}


def test_empty_transaction_is_a_noop(spark, chain):
    primary, replica, view = chain
    before = _versions([primary, replica, view])
    with multi_commit([primary, replica, view]):
        assert sync_replica(spark, primary, replica) is False
    assert _versions([primary, replica, view]) == before
    assert not get_control_plane().object_exists(
        default_txn_log([primary, replica, view])
    )


@pytest.mark.parametrize("crash_at", [0, 1, 2, 3])
def test_every_flip_crash_point_recovers_all_or_nothing(
    spark, chain, monkeypatch, crash_at
):
    """Sweep the crash point across the whole flip sequence (before
    the decision, and after each of the three pointer flips): before
    the decision document lands NOTHING may flip; after it, recovery
    must complete ALL flips — no crash point yields a half-applied
    chain that recovery cannot heal."""
    primary, replica, view = chain
    paths = [primary, replica, view]
    inner = get_control_plane()
    log = default_txn_log(paths)
    real_write = inner.write_json_atomic
    seen = {"writes": 0}

    def crashing(key, obj):
        # count only the commit sequence: the decision doc + meta flips
        if key == log or key.endswith("/_kt_meta.json"):
            if seen["writes"] == crash_at:
                raise OSError(f"simulated crash at step {crash_at}")
            seen["writes"] += 1
        real_write(key, obj)

    monkeypatch.setattr(inner, "write_json_atomic", crashing)
    # crash_at 0 kills the decision write itself -> plain abort error;
    # any later point is post-decision -> TxnCommittedError (r10 ADVICE)
    expected = OSError if crash_at == 0 else TxnCommittedError
    with pytest.raises(expected, match="simulated crash"):
        with multi_commit(paths):
            write_keyed(
                _df(spark, [(3, "a", 10.0)]), primary, "id",
                mode=SinkMode.APPEND,
            )
            sync_replica(spark, primary, replica)
            refresh_aggregate_view(spark, replica, view)
    monkeypatch.undo()
    if crash_at == 0:
        # the decision never landed: aborted, nothing flipped, no doc
        assert not inner.object_exists(log)
        assert _versions(paths) == [1, 1, 1]
    else:
        # decided: recovery completes whatever the crash left undone
        assert inner.object_exists(log)
        assert recover_multi_commit(log) is True
        assert _versions(paths) == [2, 2, 2]
        assert _totals(spark, view) == {"a": 11.0, "b": 2.0}


def test_replace_inside_transaction_is_refused(spark, chain):
    """SinkMode.REPLACE (and drop) on a registered table cannot be
    staged — it deletes the committed tree immediately, so an abort
    could not leave the table untouched (r10 review).  The refusal
    aborts the transaction with every table intact."""
    primary, replica, view = chain
    paths = [primary, replica, view]
    with pytest.raises(ValueError, match="cannot be staged"):
        with multi_commit(paths):
            write_keyed(
                _df(spark, [(9, "z", 9.0)]), primary, "id",
                mode=SinkMode.REPLACE,
            )
    assert _versions(paths) == [1, 1, 1]
    assert read_keyed(spark, primary).count() == 2


def test_foreign_commit_in_crash_window_raises_integrity_error(
    spark, chain, monkeypatch
):
    """Decided transaction, crash before ANY flip, then a foreign
    writer (leases expired with the crash) commits onto a registered
    table: recovery must raise TxnIntegrityError loudly — completing
    the flip would clobber the foreign commit (which may have GC'd the
    transaction's staged files as orphans), skipping it silently would
    half-apply the transaction (r10 review)."""
    from cascading_hbase_spark.keyed.txn import TxnIntegrityError

    primary, replica, view = chain
    paths = [primary, replica, view]
    inner = get_control_plane()
    log = default_txn_log(paths)
    real_write = inner.write_json_atomic
    state = {"doc_written": False}

    def crashing(key, obj):
        if key.endswith("/_kt_meta.json") and state["doc_written"]:
            raise OSError("simulated crash before any flip")
        if key == log:
            state["doc_written"] = True
        real_write(key, obj)

    monkeypatch.setattr(inner, "write_json_atomic", crashing)
    with pytest.raises(TxnCommittedError, match="simulated crash"):
        with multi_commit(paths):
            write_keyed(
                _df(spark, [(3, "a", 10.0)]), primary, "id",
                mode=SinkMode.APPEND,
            )
            sync_replica(spark, primary, replica)
            refresh_aggregate_view(spark, replica, view)
    monkeypatch.undo()
    assert inner.object_exists(log) and _versions(paths) == [1, 1, 1]
    # the foreign commit lands on the unflipped primary
    write_keyed(
        _df(spark, [(7, "c", 7.0)]), primary, "id", mode=SinkMode.APPEND
    )
    with pytest.raises(TxnIntegrityError, match="foreign commit"):
        recover_multi_commit(log)
    # the document stays for the operator; clean up for the test
    assert inner.object_exists(log)
    inner.delete_quiet(log)


def test_nested_or_concurrent_transaction_refused(spark, chain):
    primary, replica, view = chain
    with pytest.raises(ConcurrentWriteError, match="another transaction"):
        with multi_commit([primary]):
            with multi_commit([replica]):
                pass
    # the lock was released by the outer abort: a fresh txn works
    with multi_commit([primary]):
        pass


def test_recovery_republishes_history_after_crash_inside_apply(
    spark, chain, monkeypatch
):
    """A crash INSIDE a table's apply — manifest flipped, its history
    snapshot not yet published — must still end with the snapshot in
    the log: recovery's already-flipped skip path republishes history
    idempotently before deleting the document, which is the snapshot's
    only other copy (r10 review #2)."""
    primary, replica, view = chain
    paths = [primary, replica, view]
    inner = get_control_plane()
    log = default_txn_log(paths)
    hist_prefix = view.rstrip("/") + "/_kt_history/"
    real_write = inner.write_json_atomic

    def crashing(key, obj):
        if key.startswith(hist_prefix):
            raise OSError("simulated crash between flip and history")
        real_write(key, obj)

    monkeypatch.setattr(inner, "write_json_atomic", crashing)
    with pytest.raises(TxnCommittedError, match="between flip and history"):
        with multi_commit(paths):
            write_keyed(
                _df(spark, [(3, "a", 10.0)]), primary, "id",
                mode=SinkMode.APPEND,
            )
            sync_replica(spark, primary, replica)
            refresh_aggregate_view(spark, replica, view)
    monkeypatch.undo()
    # every manifest flipped (the view's crash hit AFTER its flip), but
    # the view's v2 snapshot is missing from the log
    assert _versions(paths) == [2, 2, 2]
    assert not inner.object_exists(hist_prefix + "v2.json")
    assert recover_multi_commit(log) is True
    assert inner.object_exists(hist_prefix + "v2.json")
    assert not inner.object_exists(log)


def test_history_prune_inside_txn_is_deferred(spark, chain, monkeypatch):
    """HISTORY_KEEP pruning triggered by a staged commit must not reach
    the real log while the transaction is undecided (r10 ADVICE): an
    abort leaves the oldest retained snapshot exactly as the
    un-advanced manifest expects it; a committed transaction prunes it
    at FLIP."""
    import cascading_hbase_spark.keyed.table as kt

    monkeypatch.setattr(kt, "HISTORY_KEEP", 3)
    primary, replica, view = chain
    for i in range(4):  # advance to version 5: log keeps v3..v5
        write_keyed(
            _df(spark, [(10 + i, "a", 1.0)]), primary, "id",
            mode=SinkMode.APPEND,
        )
    inner = get_control_plane()
    h = primary.rstrip("/") + "/_kt_history/"
    assert inner.object_exists(h + "v3.json")
    assert not inner.object_exists(h + "v2.json")
    # ABORT: the staged v6 commit prunes v3 — deferral keeps it real
    with pytest.raises(RuntimeError, match="boom"):
        with multi_commit([primary]):
            write_keyed(
                _df(spark, [(99, "z", 9.0)]), primary, "id",
                mode=SinkMode.APPEND,
            )
            raise RuntimeError("boom")
    assert _versions([primary]) == [5]
    assert inner.object_exists(h + "v3.json")  # the ADVICE's lost key
    # COMMIT: the prune lands with the flip, not before
    with multi_commit([primary]):
        write_keyed(
            _df(spark, [(99, "z", 9.0)]), primary, "id",
            mode=SinkMode.APPEND,
        )
    assert _versions([primary]) == [6]
    assert not inner.object_exists(h + "v3.json")
    assert inner.object_exists(h + "v6.json")


def test_deferred_prunes_survive_crash_and_replay_in_recovery(
    spark, chain, monkeypatch
):
    """The deferred history prunes travel in the decision document: a
    crash before ANY flip loses the in-memory staging, and recovery
    must still flip the table AND apply the prune."""
    import cascading_hbase_spark.keyed.table as kt

    monkeypatch.setattr(kt, "HISTORY_KEEP", 3)
    primary, replica, view = chain
    for i in range(4):  # version 5: log keeps v3..v5
        write_keyed(
            _df(spark, [(10 + i, "a", 1.0)]), primary, "id",
            mode=SinkMode.APPEND,
        )
    inner = get_control_plane()
    h = primary.rstrip("/") + "/_kt_history/"
    log = default_txn_log([primary])
    meta_key = primary.rstrip("/") + "/_kt_meta.json"
    real_write = inner.write_json_atomic
    state = {"doc": False}

    def crashing(key, obj):
        if state["doc"] and key == meta_key:
            raise OSError("simulated crash before the flip")
        if key == log:
            state["doc"] = True
        real_write(key, obj)

    monkeypatch.setattr(inner, "write_json_atomic", crashing)
    with pytest.raises(TxnCommittedError, match="simulated crash"):
        with multi_commit([primary]):
            write_keyed(
                _df(spark, [(99, "z", 9.0)]), primary, "id",
                mode=SinkMode.APPEND,
            )
    monkeypatch.setattr(inner, "write_json_atomic", real_write)
    # decided but nothing flipped; the prune must not have run either
    assert _versions([primary]) == [5]
    assert inner.object_exists(h + "v3.json")
    assert recover_multi_commit(log) is True
    assert _versions([primary]) == [6]
    assert not inner.object_exists(h + "v3.json")  # replayed from doc
    assert inner.object_exists(h + "v6.json")
    assert not inner.object_exists(log)


# ---------------------------------------------------------------------------
# cross-table savepoints (r12)
# ---------------------------------------------------------------------------

def test_savepoint_restore_roundtrip_and_convergence(spark, tmp_path):
    """Savepoint both tables, mutate both (append + delete), restore:
    both snap back in ONE transaction; restoring again converges (the
    rollback commit itself rolls back)."""
    from cascading_hbase_spark.keyed.table import delete_keyed
    from cascading_hbase_spark.keyed.txn import (
        restore_savepoint,
        savepoint_keyed,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_keyed(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), a, "id", retain=10)
    write_keyed(_df(spark, [(7, "x", 7.0), (8, "y", 8.0)]), b, "id", retain=10)
    sp = savepoint_keyed([a, b])
    write_keyed(
        _df(spark, [(1, "a", 99.0), (3, "c", 3.0)]), a, "id",
        mode=SinkMode.APPEND,
    )
    delete_keyed(spark, b, spark.createDataFrame([(7,)], "id long"))
    restore_savepoint(sp)
    assert sorted(
        (r.id, r.val) for r in read_keyed(spark, a).collect()
    ) == [(1, 1.0), (2, 2.0)]
    assert sorted(r.id for r in read_keyed(spark, b).collect()) == [7, 8]
    restore_savepoint(sp)  # converges, no error
    assert read_keyed(spark, a).count() == 2


def test_savepoint_restore_refuses_replaced_incarnation(spark, tmp_path):
    """REPLACE over a LIVE savepoint refuses outright (r13 — the drop
    would silently destroy the restore point); after release, REPLACE
    proceeds and the restore refuses on the incarnation change."""
    from cascading_hbase_spark.keyed.table import SavepointPinnedError
    from cascading_hbase_spark.keyed.txn import (
        SavepointError,
        release_savepoint,
        restore_savepoint,
        savepoint_keyed,
    )

    a = str(tmp_path / "a")
    write_keyed(_df(spark, [(1, "a", 1.0)]), a, "id", retain=10)
    sp = savepoint_keyed([a])
    with pytest.raises(SavepointPinnedError, match="destroy live"):
        write_keyed(
            _df(spark, [(2, "b", 2.0)]), a, "id", mode=SinkMode.REPLACE
        )
    release_savepoint(sp)
    write_keyed(_df(spark, [(2, "b", 2.0)]), a, "id", mode=SinkMode.REPLACE)
    with pytest.raises(SavepointError, match="replaced"):
        restore_savepoint(sp)


def test_savepoint_restore_aborts_atomically_past_horizon(spark, tmp_path):
    """One table's savepoint version fell below its retention horizon
    (the savepoint was RELEASED first — registered savepoints pin
    their snapshots, r13); the OTHER table's rollback was already
    staged (it sorts first) — the restore must abort with NEITHER
    table changed."""
    from cascading_hbase_spark.keyed.table import table_version
    from cascading_hbase_spark.keyed.txn import (
        SavepointError,
        release_savepoint,
        restore_savepoint,
        savepoint_keyed,
    )

    # "aa" sorts BEFORE "zz": aa's rollback stages first, then zz's
    # horizon failure must abort the whole transaction
    aa, zz = str(tmp_path / "aa"), str(tmp_path / "zz")
    write_keyed(_df(spark, [(1, "a", 1.0)]), aa, "id", retain=10)
    write_keyed(_df(spark, [(7, "x", 7.0)]), zz, "id", retain=2)
    sp = savepoint_keyed([aa, zz])
    release_savepoint(sp)  # pins gone: retention may now cross the cut
    write_keyed(_df(spark, [(2, "b", 2.0)]), aa, "id", mode=SinkMode.APPEND)
    for i in range(4):  # push zz's horizon past the savepoint
        write_keyed(
            _df(spark, [(100 + i, "z", 0.0)]), zz, "id",
            mode=SinkMode.APPEND,
        )
    v_aa = table_version(aa)
    with pytest.raises(SavepointError, match="horizon"):
        restore_savepoint(sp)
    assert table_version(aa) == v_aa, "aa flipped despite the abort"
    assert read_keyed(spark, aa).count() == 2  # mutation still there


def test_registered_savepoint_survives_retention_window(spark, tmp_path):
    """The r13 pinning story: a registered savepoint's snapshot stays
    restorable even after MORE commits than the table's retain window
    — the per-commit GC pins the covered generations and the history
    log keeps the covered manifest."""
    from cascading_hbase_spark.keyed.txn import (
        restore_savepoint,
        savepoint_keyed,
    )

    a = str(tmp_path / "a")
    write_keyed(_df(spark, [(1, "a", 1.0)]), a, "id", retain=2)
    sp = savepoint_keyed([a])
    for i in range(5):  # well past retain=2
        write_keyed(
            _df(spark, [(10 + i, "m", float(i))]), a, "id",
            mode=SinkMode.APPEND,
        )
    restore_savepoint(sp)
    assert sorted(r.id for r in read_keyed(spark, a).collect()) == [1]


def test_vacuum_refuses_live_savepoint_then_force(spark, tmp_path):
    """vacuum_keyed against a live savepoint refuses loudly BEFORE
    collecting (the operator learns the net would break, not that it
    broke); force=True vacuums AND deregisters, after which the
    restore refuses past the horizon as before."""
    from cascading_hbase_spark.keyed.table import (
        SavepointPinnedError,
        _load_savepoints,
        vacuum_keyed,
    )
    from cascading_hbase_spark.keyed.txn import (
        SavepointError,
        restore_savepoint,
        savepoint_keyed,
    )

    a = str(tmp_path / "a")
    write_keyed(_df(spark, [(1, "a", 1.0)]), a, "id", retain=10)
    sp = savepoint_keyed([a])
    write_keyed(_df(spark, [(2, "b", 2.0)]), a, "id", mode=SinkMode.APPEND)
    with pytest.raises(SavepointPinnedError, match="release_savepoint"):
        vacuum_keyed(a, retain=1)
    restore_savepoint(sp)  # the refusal preserved restorability
    assert read_keyed(spark, a).count() == 1
    # re-mutate, then force: collected AND deregistered
    write_keyed(_df(spark, [(3, "c", 3.0)]), a, "id", mode=SinkMode.APPEND)
    vacuum_keyed(a, retain=1, force=True)
    assert _load_savepoints(a) == {}
    with pytest.raises(SavepointError, match="horizon"):
        restore_savepoint(sp)


def test_expired_savepoint_stops_pinning_and_collects(spark, tmp_path):
    """An expired savepoint never pins: vacuum proceeds without force,
    the next locked writer drops the registry entry, and a restore
    whose snapshot was collected refuses loudly."""
    import time

    from cascading_hbase_spark.keyed.table import (
        _load_savepoints,
        vacuum_keyed,
    )
    from cascading_hbase_spark.keyed.txn import (
        SavepointError,
        restore_savepoint,
        savepoint_keyed,
    )

    a = str(tmp_path / "a")
    write_keyed(_df(spark, [(1, "a", 1.0)]), a, "id", retain=2)
    sp = savepoint_keyed([a], expires_at=time.time() - 1.0)  # born dead
    assert sp["_sp"]["expires_at"] is not None
    write_keyed(_df(spark, [(2, "b", 2.0)]), a, "id", mode=SinkMode.APPEND)
    # the commit's GC collected the expired registry entry
    assert _load_savepoints(a) == {}
    vacuum_keyed(a, retain=1)  # no refusal: nothing live pins
    with pytest.raises(SavepointError, match="horizon"):
        restore_savepoint(sp)


def test_release_savepoint_idempotent(spark, tmp_path):
    from cascading_hbase_spark.keyed.table import _load_savepoints
    from cascading_hbase_spark.keyed.txn import (
        release_savepoint,
        savepoint_keyed,
    )

    a = str(tmp_path / "a")
    write_keyed(_df(spark, [(1, "a", 1.0)]), a, "id", retain=10)
    sp = savepoint_keyed([a], name="predeploy")
    assert "predeploy" in _load_savepoints(a)
    release_savepoint(sp)
    assert _load_savepoints(a) == {}
    release_savepoint(sp)  # idempotent
    with pytest.raises(ValueError, match="_sp"):
        release_savepoint({a: {"version": 1, "table_id": "x"}})


def test_savepoint_pins_history_log_past_history_keep(
    spark, tmp_path, monkeypatch
):
    """HISTORY_KEEP pruning skips manifests a live savepoint covers —
    the restore needs exactly that snapshot's pointers (r13)."""
    from cascading_hbase_spark.keyed import table as kt
    from cascading_hbase_spark.keyed.txn import (
        restore_savepoint,
        savepoint_keyed,
    )

    monkeypatch.setattr(kt, "HISTORY_KEEP", 3)
    a = str(tmp_path / "a")
    write_keyed(_df(spark, [(1, "a", 1.0)]), a, "id", retain=10)
    sp = savepoint_keyed([a])
    for i in range(6):  # far past HISTORY_KEEP=3
        write_keyed(
            _df(spark, [(10 + i, "m", float(i))]), a, "id",
            mode=SinkMode.APPEND,
        )
    restore_savepoint(sp)
    assert sorted(r.id for r in read_keyed(spark, a).collect()) == [1]


def test_savepoint_cut_is_transaction_aligned(spark, chain):
    """A savepoint taken AFTER a multi_commit chain includes all three
    of its flips; restoring returns all three tables to their
    pre-chain state in one transaction."""
    from cascading_hbase_spark.keyed.matview import refresh_aggregate_view
    from cascading_hbase_spark.keyed.txn import (
        restore_savepoint,
        savepoint_keyed,
    )

    primary, replica, view = chain
    pre = savepoint_keyed([primary, replica, view])
    with multi_commit([primary, replica, view]):
        write_keyed(
            _df(spark, [(3, "c", 3.0)]), primary, "id",
            mode=SinkMode.APPEND,
        )
        sync_replica(spark, primary, replica)
        refresh_aggregate_view(spark, replica, view)
    assert _totals(spark, view) == {"a": 1.0, "b": 2.0, "c": 3.0}
    restore_savepoint(pre)
    assert _totals(spark, view) == {"a": 1.0, "b": 2.0}
    assert read_keyed(spark, primary).count() == 2
    assert read_keyed(spark, replica).count() == 2


def test_consumers_converge_across_savepoint_restore(spark, tmp_path):
    """A group RESTORE is, to every CDC consumer, just another commit:
    the rollback writes a new version whose content is the old
    snapshot, and the changefeed diff from the consumer's cursor to it
    must retract exactly the restored-away mutations.  Index, matview,
    and replica all refresh across the restore and converge to the
    restored content — the savepoint -> risky maintenance ->
    verify-or-restore pattern is only safe if the maintenance
    artifacts come back too."""
    from cascading_hbase_spark.keyed.index import (
        create_index,
        index_lookup,
        refresh_index,
    )
    from cascading_hbase_spark.keyed.matview import (
        create_aggregate_view,
        refresh_aggregate_view,
    )
    from cascading_hbase_spark.keyed.replica import (
        create_replica,
        sync_replica,
    )
    from cascading_hbase_spark.keyed.table import (
        delete_keyed,
        read_keyed,
    )
    from cascading_hbase_spark.keyed.txn import (
        restore_savepoint,
        savepoint_keyed,
    )

    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    replica = str(tmp_path / "replica")
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(30)],
        "id int, grp string, val double",
    )
    write_keyed(df, base, "id", retain=10)
    create_index(spark, base, "grp")
    create_aggregate_view(spark, base, view, "grp", {"total": "val"})
    create_replica(spark, base, replica)
    sync_replica(spark, base, replica)

    sp = savepoint_keyed([base])

    # risky maintenance: group-moving updates, inserts, deletes
    write_keyed(
        spark.createDataFrame(
            [(3, "g0", 300.0), (40, "g9", 40.0), (41, "g9", 41.0)],
            "id int, grp string, val double",
        ),
        base, "id", mode=SinkMode.APPEND,
    )
    delete_keyed(
        spark, base, spark.createDataFrame([(7,), (8,)], "id int")
    )
    refresh_index(spark, base, "grp")
    refresh_aggregate_view(spark, base, view)
    sync_replica(spark, base, replica)

    # verify failed -> restore the group
    restore_savepoint(sp)

    # every consumer refreshes ACROSS the restore commit and converges
    refresh_index(spark, base, "grp")
    refresh_aggregate_view(spark, base, view)
    sync_replica(spark, base, replica)

    cur = read_keyed(spark, base)
    assert cur.count() == 30  # the restored content
    # index: lookup == filter, and the phantom g9 value is gone
    got = sorted(
        r.id for r in index_lookup(spark, base, "grp", "g0").collect()
    )
    assert got == sorted(
        r.id for r in cur.filter("grp = 'g0'").collect()
    )
    assert index_lookup(spark, base, "grp", "g9").count() == 0
    # matview: equals first-principles recompute on the restored base
    # (read through read_aggregate_view — the g9 group that existed
    # ONLY inside the restored-away commits is now an n_rows=0
    # tombstone, the documented churn artifact the reader filters)
    import pyspark.sql.functions as Fn

    from cascading_hbase_spark.keyed.matview import read_aggregate_view
    from cascading_hbase_spark.keyed.table import read_keyed as _rk

    vw = {
        (r.grp, float(r.total))
        for r in read_aggregate_view(spark, view).collect()
    }
    exp = {
        (r.grp, float(r.total))
        for r in cur.groupBy("grp").agg(
            Fn.sum("val").alias("total")
        ).collect()
    }
    assert vw == exp
    # replica: content-identical to the restored primary
    rep = sorted(map(tuple, _rk(spark, replica).collect()))
    assert rep == sorted(map(tuple, cur.collect()))
