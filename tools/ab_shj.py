#!/usr/bin/env python
"""A/B spark.sql.join.preferSortMergeJoin in ONE process (same JVM,
same ambient): for each query, time the noop sink with the static SHJ
preference OFF (=true, Spark default) and ON (=false, the r13 session
config) in alternation, min-of-N per arm.  VERDICT r13 item 3: the
config stays only with scale evidence.

    python tools/ab_shj.py --sf-dir .scaledata/sf1 --queries a,b,c
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".scaledata", "sf1"))
    args = ap.parse_args()

    from cascading_hbase_spark.functions.hashing import use_fast_hash
    from cascading_hbase_spark.queries import QUERIES
    from cascading_hbase_spark.session import get_session

    use_fast_hash(True)
    spark = get_session("ab-shj")
    spark.sparkContext.setLogLevel("ERROR")
    names = args.queries.split(",")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # arm "smj" = preferSortMergeJoin=true (Spark default); arm "shj" =
    # false (r13 session.py).  The AQE threshold stays identical in
    # both arms — the A/B isolates the STATIC preference.
    arms = {"smj": "true", "shj": "false"}
    out = {}
    for name in names:
        walls = {a: [] for a in arms}
        for a, v in arms.items():  # warm each arm once
            spark.conf.set("spark.sql.join.preferSortMergeJoin", v)
            run(name)
        for _ in range(args.repeats):
            for a, v in arms.items():
                spark.conf.set("spark.sql.join.preferSortMergeJoin", v)
                walls[a].append(run(name))
        smj, shj = round(min(walls["smj"]), 3), round(min(walls["shj"]), 3)
        out[name] = {"smj": smj, "shj": shj}
        print(
            f"  {name}: smj={smj} shj={shj} "
            f"({'SHJ WIN' if shj < smj else 'SMJ WIN'} "
            f"{round(abs(smj - shj) / max(smj, shj) * 100)}%)",
            file=sys.stderr,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
