"""Touched-bucket pruning for changefeeds ACROSS re-bucketing
compactions — shared by the batch diff (``table.changefeed_keyed``)
and the streaming source's planner
(``streaming/changefeed_source.partitions``).

Problem (VERDICT r11 item 1): a bucket whose generation pointer is
identical at both snapshots is provably diff-free, so an incremental
consumer reads O(touched buckets) — but that proof needs IDENTICAL
bucket boundaries at both ends.  A ``compact_keyed(n_buckets=...)``
re-bucketing between the snapshots remaps every key range, and both
CDC planners used to fall back to reading BOTH full snapshots: at
100 TB, one re-bucket forced an O(table) diff on every consumer's
next sync (replica, matview, secondary index alike).  That was the
last O(table) cliff in the maintenance hot path.

Fix, in three driver-side steps over tiny manifest JSONs (no data
reads):

1. A re-bucketing compaction commits a CONTENT-PRESERVATION hint,
   ``rebucket_src = <previous version>``: it rewrote the physical
   layout but changed no logical row (its input is exactly the
   previous snapshot's live rows; the TTL purge it may perform only
   drops rows every LATER read's wall-clock filter would drop
   anyway).  The hint is what lets the walk below trust a boundary
   change; any boundary change WITHOUT it (none exists today) keeps
   the full-read fallback.
2. ``segments``: walk the per-version manifest history from the
   diff's start to its end and split it into maximal runs of
   constant boundaries.  Within a run, a bucket whose generation
   pointer is equal at the run's endpoints holds the same immutable
   files (generation numbers are monotone, never reused — even
   across rollbacks), hence the same content; across a run boundary
   the hint guarantees content equality.  So every key whose value
   differs between the two snapshots lives in some segment's
   pointer-changed bucket.
3. ``side_buckets``: map the union of those touched key ranges into
   each snapshot's own bucket space by range intersection — the
   buckets each side of the diff join must actually read.  Both
   sides still read a SUPERSET of the changed keys' buckets (an
   untouched old bucket can overlap a touched new range and must be
   read so inserts/deletes classify correctly); the win is every
   bucket that intersects NO touched range, skipped on both sides.

Fallbacks return ``None`` (read everything): a pruned history doc,
a boundary change without the hint, a missing ``gens`` map (legacy
layout), a TTL policy difference across a segment (a meta-only
``set_ttl`` turns rows into diffs without moving a pointer — the
same guard the equal-boundaries fast path has), or incomparable
boundary value types.

Pure Python over dicts on purpose: the streaming source's planning
worker imports this module too, and it must not drag Spark (or the
process-local control plane) into that worker.
"""

from __future__ import annotations

from collections.abc import Callable


def bucket_range(boundaries: list, b: int) -> tuple:
    """Half-open key range of bucket ``b`` (None = unbounded edge);
    bucket(k) = number of boundaries <= k (keyed/table.py
    ``_bucket_expr``)."""
    lo = boundaries[b - 1] if b > 0 else None
    hi = boundaries[b] if b < len(boundaries) else None
    return lo, hi


def overlapping_buckets(boundaries: list, lo, hi) -> list[int]:
    """Buckets of ``boundaries`` whose range intersects [lo, hi)."""
    out = []
    for b in range(len(boundaries) + 1):
        blo, bhi = bucket_range(boundaries, b)
        if hi is not None and blo is not None and blo >= hi:
            continue
        if lo is not None and bhi is not None and bhi <= lo:
            continue
        out.append(b)
    return out


def segments(
    v0: int,
    meta0: dict,
    v1: int,
    meta1: dict,
    load_history: Callable[[int], dict | None],
) -> list[tuple[dict, dict]] | None:
    """Split [v0, v1] into maximal constant-boundary runs, returned as
    (start_meta, end_meta) pairs, or None when the interval cannot be
    proven walkable (missing history doc, or a boundary change that
    does not carry the re-bucket content-preservation hint)."""
    segs: list[tuple[dict, dict]] = []
    start_meta = meta0
    prev_v, prev_meta = v0, meta0
    for v in range(v0 + 1, v1 + 1):
        m = meta1 if v == v1 else load_history(v)
        if m is None:
            return None
        if m.get("boundaries") != prev_meta.get("boundaries"):
            if m.get("rebucket_src") != prev_v:
                return None  # untrusted boundary change
            segs.append((start_meta, prev_meta))
            start_meta = m
        prev_v, prev_meta = v, m
    segs.append((start_meta, prev_meta))
    return segs


def touched_ranges(
    segs: list[tuple[dict, dict]],
) -> list[tuple[list, set[int]]] | None:
    """Per segment with any pointer movement: (its boundaries, the
    touched bucket ids).  None = a segment is unprovable (no gens map,
    or a TTL policy difference across it)."""
    out: list[tuple[list, set[int]]] = []
    for ma, mb in segs:
        ga, gb = ma.get("gens"), mb.get("gens")
        if ga is None or gb is None:
            return None
        if ma.get("ttl") != mb.get("ttl"):
            # read-time TTL filtering changes content without moving
            # pointers; pointer-equality proves nothing across a
            # policy change (r11 scenario-test catch, generalized
            # per-segment)
            return None
        touched = {
            int(b) for b in set(ga) | set(gb) if ga.get(b) != gb.get(b)
        }
        if touched:
            out.append((ma.get("boundaries", []), touched))
    return out


def side_buckets(
    boundaries: list, ranges: list[tuple[list, set[int]]]
) -> set[int] | None:
    """Bucket ids under ``boundaries`` whose key range intersects any
    touched range — what one SIDE of the diff must read.  None =
    boundary values were not comparable (mixed types)."""
    need: set[int] = set()
    try:
        for ob, touched in ranges:
            if ob == boundaries:
                need |= touched  # same bucket space: direct
                continue
            for t in touched:
                lo, hi = bucket_range(ob, t)
                need.update(overlapping_buckets(boundaries, lo, hi))
    except TypeError:
        return None
    return need


def changed_key_ranges(
    ranges: list[tuple[list, set[int]]],
) -> list[tuple] | None:
    """Union of the touched buckets' key ranges as a sorted, merged
    list of half-open (lo, hi) intervals (None = unbounded edge) —
    the predicate BOTH sides of a cross-re-bucket diff must restrict
    to.  Restricting to covering buckets alone is NOT enough: the two
    sides' covering-bucket sets span different key ranges (their
    bucket spaces differ), and a key read by only one side would
    surface as a spurious insert/delete.  None = boundary values were
    not comparable."""
    ivs = [bucket_range(ob, t) for ob, touched in ranges for t in touched]
    try:
        ivs.sort(key=lambda iv: (0,) if iv[0] is None else (1, iv[0]))
        merged: list[tuple] = []
        for lo, hi in ivs:
            if merged:
                plo, phi = merged[-1]
                # half-open intervals merge when touching (lo == phi)
                if phi is None or lo is None or lo <= phi:
                    merged[-1] = (
                        plo,
                        None if phi is None or hi is None else max(phi, hi),
                    )
                    continue
            merged.append((lo, hi))
    except TypeError:
        return None
    return merged


def prune_across_rebucket(
    v0: int,
    meta0: dict,
    v1: int,
    meta1: dict,
    load_history: Callable[[int], dict | None],
) -> tuple[set[int], set[int], list[tuple]] | None:
    """(old-side bucket ids, new-side bucket ids, merged changed key
    ranges) for the diff between snapshots v0 and v1, or None to fall
    back to reading both full snapshots.  The bucket sets bound the
    SCAN; the key ranges bound the JOIN — a batch consumer must apply
    them to both sides (see ``changed_key_ranges``), a per-bucket-range
    consumer (the streaming source) already restricts symmetrically.
    Cost: O(versions walked) tiny-JSON loads + O(buckets) driver-side
    arithmetic; zero data reads."""
    if v1 < v0:
        return None  # reversed interval: not a walkable history span
    segs = segments(v0, meta0, v1, meta1, load_history)
    if segs is None:
        return None
    ranges = touched_ranges(segs)
    if ranges is None:
        return None
    old_side = side_buckets(meta0.get("boundaries", []), ranges)
    new_side = side_buckets(meta1.get("boundaries", []), ranges)
    key_ranges = changed_key_ranges(ranges)
    if old_side is None or new_side is None or key_ranges is None:
        return None
    return old_side, new_side, key_ranges
