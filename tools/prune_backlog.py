#!/usr/bin/env python
"""Rewrite tests/verdict_backlog.txt to only real verification debt.

The freshness guard (tests/test_registry.py::test_verdict_freshness)
fails when a backlog entry has received a fresh driver verdict — the
file must then be pruned so it only lists pairs still awaiting
verification.  After each round's CORRECTNESS_r{N}.json lands, run:

    python tools/prune_backlog.py        # rewrites the file
    python tools/prune_backlog.py --dry  # print what would change

An entry stays in the backlog iff its newest driver verdict is absent
or old enough that it will be stale after the NEXT driver round — the
same rule the guard enforces.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BACKLOG = os.path.join(REPO, "tests", "verdict_backlog.txt")


def main() -> None:
    sys.path.insert(0, REPO)
    from tests.test_registry import FRESH_ROUNDS

    newest: dict[str, int] = {}
    max_round = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        max_round = max(max_round, rnd)
        with open(path) as f:
            for name in json.load(f):
                newest[name] = max(newest.get(name, 0), rnd)

    with open(BACKLOG) as f:
        lines = f.readlines()
    header = [ln for ln in lines if ln.lstrip().startswith("#")]
    backlog = sorted({
        ln.strip() for ln in lines
        if ln.strip() and not ln.lstrip().startswith("#")
    })

    keep = [
        q for q in backlog
        if newest.get(q, 0) < max_round - (FRESH_ROUNDS - 2)
    ]
    drained = sorted(set(backlog) - set(keep))

    print(f"newest driver round: r{max_round:02d}")
    print(f"backlog: {len(backlog)} -> {len(keep)} "
          f"({len(drained)} drained: {drained})")
    if "--dry" in sys.argv:
        return
    with open(BACKLOG, "w") as f:
        f.write("".join(header) + "\n".join(keep) + "\n")
    print(f"rewrote {BACKLOG}")


if __name__ == "__main__":
    main()
