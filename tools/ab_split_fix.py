#!/usr/bin/env python
"""A/B the split-starved repartition fix in ONE process (same JVM, same
ambient): for each bench query, time the noop sink with the fix OFF and
ON in alternation, report min-of-N per arm.

    python tools/ab_split_fix.py [--repeats N] [--queries a,b,c]
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
    ap.add_argument("--queries", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--drain", choices=("noop", "count"), default="noop",
                    help="noop = real work (guide §1.4); count = the "
                    "driver bench's drain (prunes aggregate exprs)")
    args = ap.parse_args()

    from cascading_hbase_spark.functions.hashing import use_fast_hash
    from cascading_hbase_spark.queries import BENCH_QUERIES, QUERIES
    from cascading_hbase_spark.session import get_session
    from cascading_hbase_spark.catalog import load_table

    use_fast_hash(True)
    spark = get_session("ab-split-fix")
    spark.sparkContext.setLogLevel("ERROR")
    names = args.queries.split(",") if args.queries else list(BENCH_QUERIES)

    QUERIES["each_identity"](spark, args.sf_dir).count()
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        load_table(spark, args.sf_dir, t).count()
    if any(n.startswith("copurchase") for n in names):
        QUERIES["copurchase_triangles_capped"](spark, args.sf_dir).count()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, args.sf_dir)
        if args.drain == "count":
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out = {}
    for name in names:
        walls = {"0": [], "1": []}
        for arm in ("0", "1"):  # warm each arm once
            os.environ["SPARK_GRAFT_SPLIT_STARVED_FIX"] = arm
            run(name)
        for _ in range(args.repeats):
            for arm in ("0", "1"):
                os.environ["SPARK_GRAFT_SPLIT_STARVED_FIX"] = arm
                walls[arm].append(run(name))
        off, on = round(min(walls["0"]), 3), round(min(walls["1"]), 3)
        out[name] = {"off": off, "on": on}
        print(f"  {name}: off={off} on={on} ({'WIN' if on < off else 'LOSS'} {round((off-on)/off*100)}%)",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
