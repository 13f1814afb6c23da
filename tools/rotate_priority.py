#!/usr/bin/env python
"""Report the derived driver-verification head and regenerate the
verdict backlog (VERDICT r07 item 1 — the rotation must be mechanical).

``queries()``'s ordering is computed at import from the committed
``CORRECTNESS_r*.json`` artifacts (see
``cascading_hbase_spark/queries/__init__.py::driver_order``), so there
is no list to rotate by hand any more.  This tool makes the derived
state visible and keeps ``tests/verdict_backlog.txt`` in sync:

    python tools/rotate_priority.py          # print head + rewrite backlog
    python tools/rotate_priority.py --dry    # print only

The backlog is regenerated as: every registered pair whose newest
driver verdict will be STALE once the upcoming round's CORRECTNESS
file lands (newest < (max_round+1) - (FRESH_ROUNDS-1)), minus the
pairs in the upcoming head (the driver refreshes those this round).
That is exactly the set the freshness guard
(tests/test_registry.py::test_verdict_freshness) requires listed, both
at commit time and at judge-read time after the verdicts land.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BACKLOG = os.path.join(REPO, "tests", "verdict_backlog.txt")


def main() -> None:
    sys.path.insert(0, REPO)
    from cascading_hbase_spark.queries import (
        DRIVER_BUDGET,
        QUERIES,
        _verdict_rounds,
        driver_order,
    )
    from tests.test_registry import FRESH_ROUNDS

    newest = _verdict_rounds()
    max_round = max(newest.values(), default=0)
    order = driver_order()
    head = order[:DRIVER_BUDGET]

    print(f"newest driver round: r{max_round:02d}; "
          f"upcoming head ({DRIVER_BUDGET} of {len(order)} pairs):")
    for name in head:
        rnd = newest.get(name, None)
        tag = f"r{rnd:02d}" if rnd else "never"
        print(f"  {tag:>6}  {name}")

    next_round = max_round + 1
    stale_after_next = {
        q for q in QUERIES
        if newest.get(q, 0) < next_round - (FRESH_ROUNDS - 1)
    }
    backlog = sorted(stale_after_next - set(head))
    print(f"backlog after r{next_round:02d} lands: {len(backlog)} pairs")
    if "--dry" in sys.argv:
        return
    header = (
        "# Verification-debt drain queue (VERDICT r05 items 1/7, r07 item 2).\n"
        "# Pairs whose newest driver verdict goes stale once the upcoming\n"
        "# round's CORRECTNESS file lands and which did not fit the upcoming\n"
        "# 50-slot driver head; the derived driver order schedules these\n"
        "# stalest-first in later rounds.  Regenerate: tools/rotate_priority.py;\n"
        "# prune after verdicts land: tools/prune_backlog.py.\n"
    )
    with open(BACKLOG, "w") as f:
        f.write(header + "\n".join(backlog) + "\n")
    print(f"rewrote {BACKLOG}")


if __name__ == "__main__":
    main()
