"""Multi-table atomic commit for maintenance chains (r10).

A ``MaintenanceFlow`` chain like *sync the replica, then refresh the
matview* is per-table atomic today: a crash between the two commits
leaves the pair observably inconsistent until the next run.  This
module makes the CHAIN transactional: every keyed commit inside a
``multi_commit(paths)`` block stages its manifest instead of flipping
it, and exit publishes ONE transaction document (a single
``write_json_atomic`` — the same all-or-nothing primitive every
manifest flip already uses, so on the object-store plane it is one
conditional PUT) that irrevocably decides the outcome, then applies
the per-table pointer flips.

Protocol (presumed-abort two-phase commit, recovery-completed):

1. STAGE — inside the block a proxy control plane intercepts
   ``write_json_atomic`` on the registered tables' manifest keys: the
   new manifest is held in memory and served back to subsequent reads
   (chained ops see their own writes — a replica synced in the txn
   feeds the matview refresh its post-sync state), while data files,
   history documents and leases pass through unchanged.  Data files
   written under a staged manifest are INVISIBLE, exactly like a
   single-table commit's pre-flip window.
2. DECIDE — on clean exit, after verifying no table moved under the
   transaction (current version == the version each staging was based
   on, else ``ConcurrentWriteError`` and nothing flips), the full set
   of staged manifests is published atomically at ``txn_log``.  Before
   this write the transaction is nothing but orphan files (a crash
   aborts it; the next writer's standard orphan probes clean up);
   after it the transaction is committed even if the process dies.
3. FLIP — each table's manifest pointer is flipped to its staged
   document, then the transaction document is deleted.  A crash
   mid-flip is healed by ``recover_multi_commit`` (run automatically
   at the next ``multi_commit`` on the same ``txn_log``): flips are
   idempotent via the manifest version (apply only while current <
   staged), so recovery completes the remainder and nothing reflips.

Honest contract notes: the OUTCOME is atomic (all tables flip or
none), the visibility INSTANT is not — a reader racing the flip loop
can see table A new while table B is still old for the duration of
step 3 (on a real object store, N tiny conditional PUTs).  That is the
same guarantee lakehouse multi-table transactions provide without a
shared catalog indirection, and the crash window is healed, not
leaked.  An ABORTED transaction may also have let a staged commit's
post-write GC collect one generation beyond the retain window on the
staged tables (GC passes through; see test).  The single-writer-per-
table deployment contract is unchanged — inner operations still take
their per-table writer leases.

Reference parity: the reference had no cross-table transactions at all
(HBase offers single-row atomicity; ``HBaseTap.java`` commits per
task) — this is engine surface the 100 TB maintenance story needs, not
a port.
"""

from __future__ import annotations

import contextlib
import copy
import os
from collections.abc import Iterator

from cascading_hbase_spark.keyed.controlplane import (
    ConcurrentWriteError,
    ControlPlane,
    get_control_plane,
    use_control_plane,
)

__all__ = ["multi_commit", "recover_multi_commit"]

_META = "_kt_meta.json"


def _meta_key(path: str) -> str:
    return os.path.join(path.rstrip("/"), _META)


def default_txn_log(paths: list[str]) -> str:
    """Sibling of the FIRST table, mirroring the lease/lock naming —
    pass the same ``paths`` order (or an explicit ``txn_log``) for a
    flow group so recovery always finds its own document."""
    return paths[0].rstrip("/") + "__kt_txn.json"


class _TxnControlPlane(ControlPlane):
    """Delegating proxy that defers manifest flips of the registered
    tables: staged manifests are held here and served back to reads;
    everything else (data trees, history log, leases, GC) passes
    through to the real plane."""

    def __init__(self, inner: ControlPlane, paths: list[str]):
        self._inner = inner
        self._meta_keys = {_meta_key(p) for p in paths}
        self.staged: dict[str, dict] = {}
        self.base_version: dict[str, int] = {}

    @property
    def direct_commit(self) -> bool:
        return bool(getattr(self._inner, "direct_commit", False))

    # -- interception ---------------------------------------------------

    def read_json(self, key: str) -> dict:
        if key in self.staged:
            return copy.deepcopy(self.staged[key])
        return self._inner.read_json(key)

    def write_json_atomic(self, key: str, obj: dict) -> None:
        if key in self._meta_keys:
            if key not in self.base_version:
                try:
                    self.base_version[key] = self._inner.read_json(key).get(
                        "version", 0
                    )
                except FileNotFoundError:
                    self.base_version[key] = 0
            self.staged[key] = copy.deepcopy(obj)
            return
        self._inner.write_json_atomic(key, obj)

    def object_exists(self, key: str) -> bool:
        if key in self.staged:
            return True
        return self._inner.object_exists(key)

    # -- pure delegation --------------------------------------------------

    def delete_quiet(self, key: str) -> None:
        self._inner.delete_quiet(key)

    def object_size(self, key: str) -> int:
        return self._inner.object_size(key)

    def list_names(self, prefix: str) -> list[str]:
        return self._inner.list_names(prefix)

    def dir_exists(self, prefix: str) -> bool:
        return self._inner.dir_exists(prefix)

    def ensure_dir(self, prefix: str) -> None:
        self._inner.ensure_dir(prefix)

    def delete_tree_quiet(self, prefix: str) -> None:
        self._inner.delete_tree_quiet(prefix)

    def promote_dir(self, src: str, dst: str) -> None:
        self._inner.promote_dir(src, dst)

    def move_object(self, src: str, dst: str) -> None:
        self._inner.move_object(src, dst)

    def writer_lease(self, table_path: str):
        return self._inner.writer_lease(table_path)


def recover_multi_commit(txn_log: str) -> bool:
    """Complete a decided-but-unfinished transaction at ``txn_log``
    (idempotent; flips only tables whose manifest version is still
    below the staged one), then delete the document.  Returns whether
    a transaction document was found."""
    cp = get_control_plane()
    try:
        doc = cp.read_json(txn_log)
    except FileNotFoundError:
        return False
    for key, staged in doc["tables"].items():
        try:
            cur = cp.read_json(key).get("version", 0)
        except FileNotFoundError:
            cur = 0
        if cur < staged.get("version", 0):
            cp.write_json_atomic(key, staged)
    cp.delete_quiet(txn_log)
    return True


@contextlib.contextmanager
def multi_commit(
    paths: list[str], txn_log: str | None = None
) -> Iterator[None]:
    """Run a maintenance chain whose keyed commits to ``paths`` land
    as ONE atomic multi-table transaction (see module docstring).

    Any exception inside the block aborts: no manifest flips, the
    chain's data files become invisible orphans cleaned by the next
    writer's standard probes."""
    if not paths:
        raise ValueError("multi_commit needs at least one table path")
    inner = get_control_plane()
    log = txn_log or default_txn_log(paths)
    recover_multi_commit(log)  # heal a predecessor's crash first
    proxy = _TxnControlPlane(inner, paths)
    with use_control_plane(proxy):
        yield
    if not proxy.staged:
        return
    # pre-flight: refuse to decide over a table that moved under us
    for key, base in proxy.base_version.items():
        try:
            cur = inner.read_json(key).get("version", 0)
        except FileNotFoundError:
            cur = 0
        if cur != base:
            raise ConcurrentWriteError(
                f"multi_commit: {key} advanced from v{base} to v{cur} "
                f"during the transaction; aborting (nothing flipped)"
            )
    # DECIDE: one atomic publish — after this the outcome is committed
    inner.write_json_atomic(log, {"tables": proxy.staged})
    # FLIP: idempotent pointer advances; a crash here is healed by
    # recover_multi_commit on the same txn_log
    for key, staged in proxy.staged.items():
        inner.write_json_atomic(key, staged)
    inner.delete_quiet(log)
