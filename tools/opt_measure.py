#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1).

For each headline bench query: dump ``.explain("formatted")`` to
``plans/<round>/<name>_<tag>.txt`` and time the computation alone via
the noop sink (``df.write.format("noop")``), repeats with min + p50,
jobs labelled via ``setJobDescription``.  This is the isolation tool
the round's before/after evidence comes from; ``bench.py`` (the driver
contract, count()-drained) is unchanged.

Usage:
    python tools/opt_measure.py <tag> [--queries a,b,c] [--repeats N]
                                [--sf-dir DIR] [--no-plans] [--no-time]
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
    ap.add_argument("tag")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--round", default="r13")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    from cascading_hbase_spark.functions.hashing import use_fast_hash
    from cascading_hbase_spark.queries import BENCH_QUERIES, QUERIES
    from cascading_hbase_spark.session import get_session
    from cascading_hbase_spark.catalog import load_table

    use_fast_hash(True)
    spark = get_session("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")

    names = args.queries.split(",") if args.queries else list(BENCH_QUERIES)
    plans_dir = os.path.join(REPO, "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)

    if not args.no_time:
        # Same warmup as bench.py: footers + pinned graph edges.
        QUERIES["each_identity"](spark, args.sf_dir).count()
        for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
            load_table(spark, args.sf_dir, t).count()
        if any(n.startswith("copurchase") for n in names):
            QUERIES["copurchase_triangles_capped"](spark, args.sf_dir).count()
    elif any(n.startswith("copurchase") for n in names):
        # plan-only still needs the pinned edge relations to exist
        QUERIES["copurchase_triangles_capped"](spark, args.sf_dir).count()

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    timings_p50: dict[str, float] = {}
    for name in names:
        df = QUERIES[name](spark, args.sf_dir)
        if not args.no_plans:
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if args.no_time:
            continue
        walls = []
        spark.sparkContext.setJobDescription(f"opt:{name}")
        noop(df)  # one untimed warm run per query
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            noop(QUERIES[name](spark, args.sf_dir))
            walls.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        s = sorted(walls)
        timings[name] = round(s[0], 3)
        timings_p50[name] = round(s[len(s) // 2] if len(s) % 2 else (s[len(s)//2-1]+s[len(s)//2])/2, 3)
        print(f"  {name}: min={timings[name]} p50={timings_p50[name]}", file=sys.stderr)

    if not args.no_time:
        out = {
            "tag": args.tag,
            "sink": "noop",
            "queries": timings,
            "queries_p50": timings_p50,
            "total": round(sum(timings.values()), 3),
            "repeats": args.repeats,
            "sf_dir": args.sf_dir,
        }
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
