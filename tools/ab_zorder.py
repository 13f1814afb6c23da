#!/usr/bin/env python
"""A/B write_zordered's two routings in ONE process at a given SF:
range (sampling re-executes the full-width child) vs hist (narrow
percentile cuts + label routing).  VERDICT r13 item 5.

    python tools/ab_zorder.py [--sf-dir DIR] [--repeats N] [--n-files N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".scaledata", "sf1"))
    ap.add_argument("--n-files", type=int, default=32)
    args = ap.parse_args()

    from cascading_hbase_spark.catalog import load_table
    from cascading_hbase_spark.operators.zorder import write_zordered
    from cascading_hbase_spark.session import get_session

    spark = get_session("ab-zorder")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, args.sf_dir, "lineitem")
    li.count()  # warm footers/page cache

    out = {}
    zdir = tempfile.mkdtemp(prefix="ab-zorder-")
    try:
        def run(route: str) -> float:
            t0 = time.perf_counter()
            write_zordered(
                li, os.path.join(zdir, route), ["l_partkey", "l_orderkey"],
                n_files=args.n_files, route=route,
            )
            return time.perf_counter() - t0

        walls = {"range": [], "hist": []}
        for r in walls:  # warm each arm once
            run(r)
        for _ in range(args.repeats):
            for r in walls:
                walls[r].append(run(r))
        out = {r: round(min(w), 3) for r, w in walls.items()}
        # sanity: both outputs hold the same rows
        n_range = spark.read.parquet(os.path.join(zdir, "range")).count()
        n_hist = spark.read.parquet(os.path.join(zdir, "hist")).count()
        out["rows_match"] = bool(n_range == n_hist)
        import glob as _g
        out["files_range"] = len(_g.glob(os.path.join(zdir, "range", "*.parquet")))
        out["files_hist"] = len(_g.glob(os.path.join(zdir, "hist", "*.parquet")))
    finally:
        shutil.rmtree(zdir, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
