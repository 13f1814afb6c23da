"""Object-store control plane: the documented cloud port, implemented.

``keyed.controlplane`` defined the seam and documented, per method, how
a cloud object store satisfies it (conditional-PUT commit, TTL lease,
rename-free promotion).  This module implements that port against an
EMULATED store so every protocol claim is executable and race-tested —
the remaining gap to a real deployment is swapping
``EmulatedObjectStore`` for an SDK client with the same five
primitives (conditional PUT / GET / HEAD / DELETE / prefix LIST), all
of which S3 (``If-None-Match``/``If-Match``, 2024+ conditional
writes), GCS (``ifGenerationMatch``) and ABS (ETag conditions)
provide natively.

What is REAL here, not mocked:

- the commit protocol — ``write_json_atomic`` publishes a new
  versioned manifest object and then flips a tiny latest-pointer
  object with a conditional PUT; a lost precondition surfaces as
  ``ConcurrentWriteError``.  Two racing committers settle at the
  pointer flip: exactly one wins (tested with real threads);
- the writer lease — a conditional-PUT lease object carrying holder +
  expiry; a live lease excludes contenders, an expired one is
  reclaimed by exactly one of them (``If-Match`` on the stale lease's
  ETag), and release is a conditional DELETE so a slow old holder can
  never delete its successor's lease;
- rename-free data commits — the plane sets ``direct_commit`` so the
  engine writes parquet files DIRECTLY at their final generation keys
  (``_kt_bucket=<b>/_kt_gen=<n>``; invisible until the manifest
  references them) and ``promote_dir`` refuses to exist.  On S3 a
  "rename" is a full copy + delete of every object; at 100 TB the
  stage-then-promote pattern would copy the table once per commit —
  this plane proves the engine needs no rename anywhere on the write
  path.

Hybrid by design, like a real deployment: CONTROL objects (the
manifest, the per-commit history log, the lease) live in the store;
the DATA plane stays whatever path Spark reads/writes (here the local
FS standing in for ``s3a://`` data keys, which Spark's committers
already handle).  Reference parity note: the reference delegates all
of this to HBase region servers + ZooKeeper (``HBaseTap.java:69-93``
holds only a client-side admin connection); an object store offers no
such coordinator, which is exactly why the commit point must be a
conditional PUT.
"""

from __future__ import annotations

import contextlib
import json
import os
import re
import shutil
import threading
import time
import uuid
from collections.abc import Iterator

from .controlplane import ConcurrentWriteError, ControlPlane

__all__ = [
    "EmulatedObjectStore",
    "FileBackedObjectStore",
    "ObjectStoreControlPlane",
    "PreconditionFailed",
]


class PreconditionFailed(Exception):
    """A conditional PUT/DELETE's precondition did not hold (the
    store-level signal; the plane maps it to ``ConcurrentWriteError``
    where it means a lost commit race)."""


class EmulatedObjectStore:
    """A flat-namespace object store with exactly the primitives the
    port needs: atomic conditional PUT (``If-None-Match`` /
    ``If-Match``-by-ETag), GET, HEAD, conditional DELETE, server-side
    COPY and prefix LIST.  Deliberately NO rename/move primitive —
    object stores don't have one, and the plane must not need one.

    Thread-safe (one lock around every primitive — each S3/GCS request
    is individually atomic, which is all the protocol assumes).
    ``time_fn`` is injectable so lease-expiry behavior is testable
    without sleeping.
    """

    def __init__(self, time_fn=time.monotonic):
        self._objects: dict[str, tuple[bytes, str]] = {}
        self._lock = threading.Lock()
        self._etag_seq = 0
        self.time_fn = time_fn

    def _next_etag(self) -> str:
        self._etag_seq += 1
        return f"etag-{self._etag_seq}"

    def put(
        self,
        key: str,
        data: bytes,
        *,
        if_none_match: bool = False,
        if_match: str | None = None,
    ) -> str:
        """Store ``data`` under ``key`` and return the new ETag.

        ``if_none_match=True`` fails if the key exists (exclusive
        create); ``if_match=<etag>`` fails unless the key exists with
        exactly that ETag (compare-and-swap).  The two are mutually
        exclusive, as in the HTTP headers they model."""
        if if_none_match and if_match is not None:
            raise ValueError("if_none_match and if_match are exclusive")
        with self._lock:
            cur = self._objects.get(key)
            if if_none_match and cur is not None:
                raise PreconditionFailed(f"{key}: already exists")
            if if_match is not None and (cur is None or cur[1] != if_match):
                raise PreconditionFailed(f"{key}: etag mismatch")
            etag = self._next_etag()
            self._objects[key] = (bytes(data), etag)
            return etag

    def get(self, key: str) -> tuple[bytes, str]:
        """(data, etag); raises ``KeyError`` when absent."""
        with self._lock:
            data, etag = self._objects[key]
            return data, etag

    def head(self, key: str) -> str | None:
        """Current ETag, or ``None`` when absent."""
        with self._lock:
            cur = self._objects.get(key)
            return None if cur is None else cur[1]

    def size(self, key: str) -> int:
        with self._lock:
            return len(self._objects[key][0])

    def delete(self, key: str, *, if_match: str | None = None) -> None:
        """Idempotent delete; with ``if_match`` it only deletes the
        exact version named (absent key + ``if_match`` is a no-op —
        the version is gone either way)."""
        with self._lock:
            cur = self._objects.get(key)
            if cur is None:
                return
            if if_match is not None and cur[1] != if_match:
                raise PreconditionFailed(f"{key}: etag mismatch")
            del self._objects[key]

    def copy(self, src: str, dst: str) -> str:
        """Server-side copy (the half of "move" stores do have)."""
        with self._lock:
            data, _ = self._objects[src]
            etag = self._next_etag()
            self._objects[dst] = (data, etag)
            return etag

    def list_keys(self, prefix: str) -> list[str]:
        with self._lock:
            return sorted(k for k in self._objects if k.startswith(prefix))

    def child_names(self, prefix: str) -> list[str]:
        """Delimiter-style listing: immediate child names under
        ``prefix`` (both "files" and common prefixes)."""
        norm = prefix.rstrip("/") + "/"
        with self._lock:
            return sorted(
                {
                    k[len(norm):].split("/", 1)[0]
                    for k in self._objects
                    if k.startswith(norm)
                }
            )


class FileBackedObjectStore:
    """The emulated store with its objects on a SHARED directory —
    the same five primitives as ``EmulatedObjectStore`` (conditional
    PUT / GET / HEAD / conditional DELETE / prefix LIST), but visible
    across PROCESSES, the way a real bucket is.

    Why it exists: the in-memory emulation is process-local by
    construction, which made the changefeed STREAMING source's
    planning worker (a separate Python process Spark spawns on the
    driver) blind to the control plane — streaming CDC was localfs-
    only under ``KT_PLANE=objectstore`` (VERDICT r11 item 2).  A real
    cloud port reconstructs its SDK client in that worker from
    endpoint/credentials; this store reconstructs from ``root``, so
    the plane-spec plumbing (``ControlPlane.plane_spec`` ->
    ``.option("plane", ...)`` -> worker-side rebuild) is exercised
    end-to-end exactly as a real deployment would use it.

    Mechanics: one file per object (key percent-quoted into a flat
    namespace), payload = JSON {etag, b64 data}, every primitive
    under one OS-level ``flock`` so each request is individually
    atomic — the same assumption the protocol makes of S3/GCS.
    Request atomicity, not caching: every call re-reads the backing
    file, so two processes interleave exactly like two clients of one
    bucket.  ``time_fn`` defaults to wall-clock (``time.time``) —
    lease expiry must mean the same thing in every process."""

    def __init__(self, root: str, time_fn=time.time):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._lockfile = os.path.join(root, ".lock")
        self.time_fn = time_fn

    @contextlib.contextmanager
    def _locked(self):
        import fcntl

        with open(self._lockfile, "w") as f:
            fcntl.flock(f, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(f, fcntl.LOCK_UN)

    def _fname(self, key: str) -> str:
        from urllib.parse import quote

        return os.path.join(self.root, quote(key, safe=""))

    def _read(self, key: str):
        try:
            with open(self._fname(key)) as f:
                doc = json.load(f)
        except (FileNotFoundError, ValueError):
            return None
        import base64

        return base64.b64decode(doc["data"]), doc["etag"]

    def _write(self, key: str, data: bytes) -> str:
        import base64

        etag = f"etag-{uuid.uuid4().hex[:16]}"
        fn = self._fname(key)
        tmp = fn + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {"etag": etag, "data": base64.b64encode(data).decode()}, f
            )
        os.replace(tmp, fn)
        return etag

    def put(
        self,
        key: str,
        data: bytes,
        *,
        if_none_match: bool = False,
        if_match: str | None = None,
    ) -> str:
        if if_none_match and if_match is not None:
            raise ValueError("if_none_match and if_match are exclusive")
        with self._locked():
            cur = self._read(key)
            if if_none_match and cur is not None:
                raise PreconditionFailed(f"{key}: already exists")
            if if_match is not None and (cur is None or cur[1] != if_match):
                raise PreconditionFailed(f"{key}: etag mismatch")
            return self._write(key, data)

    def get(self, key: str) -> tuple[bytes, str]:
        with self._locked():
            cur = self._read(key)
            if cur is None:
                raise KeyError(key)
            return cur

    def head(self, key: str) -> str | None:
        with self._locked():
            cur = self._read(key)
            return None if cur is None else cur[1]

    def size(self, key: str) -> int:
        with self._locked():
            cur = self._read(key)
            if cur is None:
                raise KeyError(key)
            return len(cur[0])

    def delete(self, key: str, *, if_match: str | None = None) -> None:
        with self._locked():
            cur = self._read(key)
            if cur is None:
                return
            if if_match is not None and cur[1] != if_match:
                raise PreconditionFailed(f"{key}: etag mismatch")
            with contextlib.suppress(OSError):
                os.remove(self._fname(key))

    def copy(self, src: str, dst: str) -> str:
        with self._locked():
            cur = self._read(src)
            if cur is None:
                raise KeyError(src)
            return self._write(dst, cur[0])

    def _all_keys(self) -> list[str]:
        from urllib.parse import unquote

        try:
            names = os.listdir(self.root)
        except FileNotFoundError:
            return []
        return [
            unquote(n)
            for n in names
            if n != ".lock" and ".tmp" not in n
        ]

    def list_keys(self, prefix: str) -> list[str]:
        with self._locked():
            return sorted(k for k in self._all_keys() if k.startswith(prefix))

    def child_names(self, prefix: str) -> list[str]:
        norm = prefix.rstrip("/") + "/"
        with self._locked():
            return sorted(
                {
                    k[len(norm):].split("/", 1)[0]
                    for k in self._all_keys()
                    if k.startswith(norm)
                }
            )


# A versioned manifest object: "<pointer-key>.v<N>-<attempt>".  The
# suffix keeps versioned objects out of delimiter listings of ".json"
# control documents.
_VERSIONED = re.compile(r"\.json\.v\d+(-|$)")


def _is_control_key(key: str) -> bool:
    # Every control document the engine publishes is a .json key (the
    # manifest, the history log); data keys are parquet files/dirs.
    return key.endswith(".json")


class ObjectStoreControlPlane(ControlPlane):
    """``ControlPlane`` over an ``EmulatedObjectStore`` — the cloud
    port of the seam, faithful to each method's documented semantics.

    ``direct_commit = True`` switches the engine's data writes to the
    rename-free pattern (files written at final generation keys; the
    manifest flip is the only commit point), and ``promote_dir``
    raises — under this plane nothing may ever rename.

    ``lease_ttl`` bounds how long a crashed writer blocks the table
    (production would heartbeat long commits; the single-writer
    deployment contract is unchanged).  ``holder`` names this driver
    in the lease document.
    """

    direct_commit = True

    def __init__(
        self,
        store: EmulatedObjectStore | None = None,
        *,
        holder: str | None = None,
        lease_ttl: float = 300.0,
    ):
        self.store = store if store is not None else EmulatedObjectStore()
        self.holder = holder or f"pid-{os.getpid()}"
        self.lease_ttl = float(lease_ttl)
        # table_path -> (lease key, etag) while inside writer_lease;
        # write_json_atomic re-verifies ownership just before the
        # pointer flip (see there)
        self._held_leases: dict[str, tuple[str, str]] = {}
        self._held_lock = threading.Lock()

    def plane_spec(self) -> dict | None:
        # only the file-backed store is visible from another process;
        # the in-memory emulation deliberately returns None so the
        # streaming source refuses instead of misreading local paths
        if isinstance(self.store, FileBackedObjectStore):
            return {"kind": "objectstore", "root": self.store.root}
        return None

    # -- control documents: versioned object + latest-pointer flip -----

    def read_json(self, key: str) -> dict:
        try:
            pdata, _ = self.store.get(key)
        except KeyError:
            raise FileNotFoundError(key) from None
        vkey = json.loads(pdata)["object"]
        try:
            data, _ = self.store.get(vkey)
        except KeyError:
            # pruned under a reader that raced >1 commits — same
            # contract as local GC: the snapshot is gone
            raise FileNotFoundError(vkey) from None
        return json.loads(data)

    def write_json_atomic(self, key: str, obj: dict) -> None:
        """THE commit primitive: PUT the document at a UNIQUE versioned
        key (exclusive create of a fresh name — no attempt can ever
        overwrite another's object, committed or not), then flip the
        latest-pointer with a conditional PUT against the exact pointer
        version this writer last read.  A competing commit in the gap
        makes the precondition fail -> ``ConcurrentWriteError``; the
        loser deletes its own orphan and nothing it wrote is ever
        visible.  The winner prunes versioned objects AT OR BELOW its
        own version except the one it just committed and its
        predecessor (a reader holding the just-replaced pointer can
        still GET its object — one-commit grace, matching the local
        plane's GC contract); objects above its version belong to
        commits that began after the flip and will win their own CAS,
        so they are never touched."""
        try:
            pdata, petag = self.store.get(key)
            p = json.loads(pdata)
            v, prev_obj = p["v"], p["object"]
        except KeyError:
            petag, v, prev_obj = None, 0, None
        vkey = f"{key}.v{v + 1}-{uuid.uuid4().hex[:12]}"
        self.store.put(vkey, json.dumps(obj).encode(), if_none_match=True)
        pointer = json.dumps({"v": v + 1, "object": vkey}).encode()
        # Pre-flip lease re-verification (r09 ADVICE): the lease has a
        # TTL but no heartbeat, so a commit outrunning lease_ttl lets a
        # contender reclaim mid-commit; the pointer CAS protects the
        # MANIFEST but the two writers share generation data keys, so
        # our flip could expose a mix of both writers' files.  One HEAD
        # against the lease we hold for this key's table closes that
        # window to the check->CAS gap: a changed/vanished etag means
        # we were reclaimed — refuse to flip, delete our own orphan.
        with self._held_lock:
            held = [
                (lk, etag)
                for tp, (lk, etag) in self._held_leases.items()
                if key.startswith(tp.rstrip("/") + "/")
            ]
        for lk, etag in held:
            if self.store.head(lk) != etag:
                self.store.delete(vkey)
                raise ConcurrentWriteError(
                    f"writer lease {lk} was reclaimed mid-commit (commit "
                    f"outran lease_ttl={self.lease_ttl:.0f}s); refusing "
                    f"to flip {key} — retry under a fresh lease"
                )
        try:
            if petag is None:
                self.store.put(key, pointer, if_none_match=True)
            else:
                self.store.put(key, pointer, if_match=petag)
        except PreconditionFailed as e:
            self.store.delete(vkey)  # our own orphan, never referenced
            raise ConcurrentWriteError(
                f"lost the manifest-pointer race on {key} (a competing "
                f"commit won); retry from the new snapshot"
            ) from e
        # prune: losers' orphans, crashed leftovers and anything two
        # commits old — but ONLY versions <= the one we just committed.
        # A commit that began AFTER our flip read the fresh pointer and
        # has already PUT its v+2 object; its CAS will SUCCEED, so
        # deleting "everything not mine" would destroy a winning
        # commit's document and leave the pointer naming a deleted
        # object (table unreadable until manual repair).
        for k in self.store.list_keys(key + ".v"):
            if k in (vkey, prev_obj):
                continue
            m = re.match(r"\.v(\d+)-", k[len(key):])
            if m and int(m.group(1)) <= v + 1:
                self.store.delete(k)

    def object_exists(self, key: str) -> bool:
        if _is_control_key(key):
            return self.store.head(key) is not None
        return os.path.isfile(key)

    def delete_quiet(self, key: str) -> None:
        if _is_control_key(key):
            for k in (key, *self.store.list_keys(key + ".v")):
                self.store.delete(k)
        else:
            with contextlib.suppress(OSError):
                os.remove(key)

    def object_size(self, key: str) -> int:
        if _is_control_key(key):
            try:
                pdata, _ = self.store.get(key)
                return self.store.size(json.loads(pdata)["object"])
            except KeyError:
                raise FileNotFoundError(key) from None
        return os.path.getsize(key)

    # -- trees / listings: store children ∪ data-plane children --------

    def list_names(self, prefix: str) -> list[str]:
        try:
            fs = set(os.listdir(prefix))
        except (FileNotFoundError, NotADirectoryError):
            fs = set()
        virtual = {
            n for n in self.store.child_names(prefix) if not _VERSIONED.search(n)
        }
        return sorted(fs | virtual)

    def dir_exists(self, prefix: str) -> bool:
        if os.path.isdir(prefix):
            return True
        return bool(self.store.list_keys(prefix.rstrip("/") + "/"))

    def ensure_dir(self, prefix: str) -> None:
        # virtual in the store; real for the data plane Spark writes to
        os.makedirs(prefix, exist_ok=True)

    def delete_tree_quiet(self, prefix: str) -> None:
        # batch-delete of every store key under the prefix (REPLACE /
        # drop / GC), plus the data-plane tree
        for k in self.store.list_keys(prefix.rstrip("/") + "/"):
            self.store.delete(k)
        shutil.rmtree(prefix, ignore_errors=True)

    def promote_dir(self, src: str, dst: str) -> None:
        raise AssertionError(
            "rename-free plane: data files are written directly at "
            "their final generation keys (direct_commit), nothing may "
            f"promote {src} -> {dst}"
        )

    def move_object(self, src: str, dst: str) -> None:
        # server-side copy + delete — the only "move" stores have
        if _is_control_key(src):
            # move the DOCUMENT, not the pointer: a verbatim pointer
            # copy would leave dst referencing a src-named versioned
            # object that src's next write_json_atomic prune (or a
            # delete under the src prefix) destroys out from under it
            self.write_json_atomic(dst, self.read_json(src))
            self.delete_quiet(src)
        else:
            shutil.copyfile(src, dst)
            os.remove(src)

    # -- writer lease: conditional-PUT object with TTL -----------------

    def _lease_key(self, table_path: str) -> str:
        return table_path.rstrip("/") + "__kt_lease.json"

    @contextlib.contextmanager
    def writer_lease(self, table_path: str) -> Iterator[None]:
        """Acquire = exclusive PUT of a lease object naming holder +
        expiry.  A live lease (unexpired, other holder) excludes us; an
        expired one is reclaimed with ``If-Match`` on its ETag so
        exactly one contender wins the reclaim.  Release is a
        conditional DELETE of the exact lease we hold — a paused old
        holder waking after expiry cannot delete its successor's
        lease."""
        store, key = self.store, self._lease_key(table_path)
        doc = lambda: json.dumps(  # noqa: E731 - tiny local factory
            {"holder": self.holder, "expires": store.time_fn() + self.lease_ttl}
        ).encode()
        try:
            etag = store.put(key, doc(), if_none_match=True)
        except PreconditionFailed:
            try:
                cur_data, cur_etag = store.get(key)
            except KeyError:
                # released between our PUT and GET — one clean retry
                try:
                    etag = store.put(key, doc(), if_none_match=True)
                except PreconditionFailed as e:
                    raise ConcurrentWriteError(
                        f"keyed table {table_path}: writer lease contended "
                        f"({key})"
                    ) from e
            else:
                cur = json.loads(cur_data)
                if cur["expires"] > store.time_fn():
                    raise ConcurrentWriteError(
                        f"keyed table {table_path} is being written by "
                        f"{cur['holder']} (lease {key} live for "
                        f"{cur['expires'] - store.time_fn():.0f}s); keyed "
                        f"tables are single-writer"
                    ) from None
                try:  # expired: exactly one contender's CAS wins
                    etag = store.put(key, doc(), if_match=cur_etag)
                except PreconditionFailed as e:
                    raise ConcurrentWriteError(
                        f"keyed table {table_path}: lost the expired-lease "
                        f"reclaim race ({key})"
                    ) from e
        tp = table_path.rstrip("/")
        with self._held_lock:
            self._held_leases[tp] = (key, etag)
        try:
            yield
        finally:
            with self._held_lock:
                self._held_leases.pop(tp, None)
            with contextlib.suppress(PreconditionFailed):
                store.delete(key, if_match=etag)
