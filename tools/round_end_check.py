#!/usr/bin/env python
"""End-of-round gate: prove the suite will be green AT THE JUDGE'S READ,
not just at commit time.

The freshness guard (tests/test_registry.py::test_verdict_freshness)
was red at the judge's read in rounds 6 and 7 because it was only ever
run against the PREVIOUS round's artifacts: when the new round's
CORRECTNESS file landed, the guard's freshness window rolled forward
and previously-fresh verdicts aged out.  This tool closes that gap
mechanically — run it before the final commit of every round:

    python tools/round_end_check.py

1. Clones the repo tree to a scratch dir and writes a SIMULATED
   CORRECTNESS_r{N+1}.json containing the derived driver head (exactly
   what the driver will verify), then runs tests/test_registry.py
   there — the guard must be green in the post-landing world.
2. Runs tests/test_registry.py in the real tree (green at HEAD too).
3. Cross-checks ``_CHANGED_THIS_ROUND`` against the round's actual
   git diff (since the driver's last round-end commit): a stale
   hand-list entry whose registering module was never touched this
   round would silently burn driver slots re-verifying green pairs —
   the exact r07 failure mode, one level up (VERDICT r08 item).
4. Runs the driver-protocol dress rehearsal of the derived head at
   ALL THREE SFs (sf0.001 / sf0.01 / sf0.1 — round 8 found three real
   bugs only one SF each exposed).  ``--no-rehearse`` skips (e.g. when
   the full-registry rehearsal already ran separately);
   ``--rehearse-n N`` overrides the head size (270 = whole registry).
5. Prints the derived head summary so the rotation is visible.

Exit code 0 = safe to land the round.  Nonzero = fix the backlog
(tools/rotate_priority.py regenerates it) before committing.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def run(cmd: list[str], cwd: str) -> int:
    print(f"$ {' '.join(cmd)}  (cwd={cwd})")
    return subprocess.call(cmd, cwd=cwd)


def _round_start_commit() -> str | None:
    """The driver's last round-end commit ('round N: verdict/...') —
    everything after it is THIS round's work."""
    out = subprocess.run(
        ["git", "log", "--grep", r"^round [0-9]*: verdict", "-1",
         "--format=%H"],
        cwd=REPO, capture_output=True, text=True,
    )
    sha = out.stdout.strip()
    return sha or None


def changed_list_matches_git() -> bool:
    """Every _CHANGED_THIS_ROUND entry must have its registering module
    actually touched since round start (committed or working-tree)."""
    from cascading_hbase_spark.queries import _CHANGED_THIS_ROUND

    if not _CHANGED_THIS_ROUND:
        print("_CHANGED_THIS_ROUND: empty — nothing to cross-check")
        return True
    base = _round_start_commit()
    if base is None:
        print("_CHANGED_THIS_ROUND: no round-start commit found — skipping "
              "the git cross-check (fresh clone?)")
        return True
    diff = subprocess.run(
        ["git", "diff", "--name-only", base],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.split()
    changed_files = set(diff)
    ok = True
    for name in _CHANGED_THIS_ROUND:
        registering = [
            os.path.relpath(p, REPO)
            for p in glob.glob(
                os.path.join(REPO, "cascading_hbase_spark", "queries", "*.py")
            )
            # __init__.py quotes every _CHANGED_THIS_ROUND name by
            # construction (it holds the list) — counting it would make
            # this check pass vacuously whenever the list is edited
            if os.path.basename(p) != "__init__.py"
            and f'"{name}"' in open(p).read()
        ]
        if not any(r in changed_files for r in registering):
            print(
                f"STALE _CHANGED_THIS_ROUND entry: {name!r} — none of its "
                f"registering modules ({registering}) changed since round "
                f"start ({base[:8]}); remove it or it burns a driver slot"
            )
            ok = False
    if ok:
        print(f"_CHANGED_THIS_ROUND: {len(_CHANGED_THIS_ROUND)} entries all "
              f"match the round's git diff")
    return ok


def main() -> int:
    sys.path.insert(0, REPO)
    from cascading_hbase_spark.queries import DRIVER_BUDGET, driver_order, _verdict_rounds

    rehearse = "--no-rehearse" not in sys.argv
    rehearse_n = None
    if "--rehearse-n" in sys.argv:
        rehearse_n = int(sys.argv[sys.argv.index("--rehearse-n") + 1])

    newest = _verdict_rounds()
    max_round = max(newest.values(), default=0)
    head = driver_order()[:DRIVER_BUDGET]
    never = [n for n in head if n not in newest]
    print(f"derived r{max_round + 1:02d} head: {len(head)} pairs "
          f"({len(never)} never-verified; stalest verdict r"
          f"{min((newest.get(n, 99) for n in head if n in newest), default=0):02d})")

    # 1) post-landing simulation in a scratch clone
    scratch = tempfile.mkdtemp(prefix="round_end_")
    try:
        clone = os.path.join(scratch, "repo")
        shutil.copytree(
            REPO, clone,
            ignore=shutil.ignore_patterns(
                ".git", "spark-warehouse", ".scaledata", "__pycache__",
                ".hypothesis", ".pytest_cache",
            ),
        )
        sim = {n: {"rows_match": True, "schema_match": True,
                   "hash_match": True} for n in head}
        with open(os.path.join(clone, f"CORRECTNESS_r{max_round + 1:02d}.json"), "w") as f:
            json.dump(sim, f)
        rc1 = run([sys.executable, "-m", "pytest", "tests/test_registry.py", "-q", "-rs"], clone)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    # 2) guard at HEAD as-is
    rc2 = run([sys.executable, "-m", "pytest", "tests/test_registry.py", "-q", "-rs"], REPO)

    # 3) hand-list vs reality
    changed_ok = changed_list_matches_git()

    # 4) driver-protocol rehearsal at all three SFs
    rc3 = 0
    if rehearse:
        n = rehearse_n if rehearse_n is not None else DRIVER_BUDGET
        for sf in SF_DIRS:
            rc = run(
                [sys.executable, "tools/dress_rehearsal.py", sf, str(n)],
                REPO,
            )
            rc3 = rc3 or rc
    else:
        print("rehearsal: SKIPPED (--no-rehearse)")

    ok = rc1 == 0 and rc2 == 0 and changed_ok and rc3 == 0
    print(f"round-end gate: {'GREEN (safe to land)' if ok else 'RED — fix before committing'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
