#!/usr/bin/env python
"""Scale the sf0.1 testdata ~Nx (default 10x -> "sf1") for the local
scale probe: fact tables (lineitem, orders, events, documents,
embeddings) are unioned N times with id columns shifted by a
per-table span so keys stay unique and referential integrity holds
(lineitem.l_orderkey shifts in lockstep with orders.o_orderkey; dim
foreign keys are untouched because dims are copied as-is — the usual
warehouse shape where facts outgrow dims).

Usage: python tools/scale_testdata.py [out_dir] [copies]
Default out: /root/repo/.scaledata/sf1 (gitignored).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from cascading_hbase_spark.catalog import load_table  # noqa: E402
from cascading_hbase_spark.session import get_session  # noqa: E402

SRC = "/root/testdata/sf0.1"
DIMS = ["region", "nation", "customer", "supplier", "part"]
# fact table -> id columns shifted per copy (same span for columns
# sharing a key space across tables)
FACT_SHIFTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key spaces shared across tables get one span keyed by span name
SPAN_OF = {
    "o_orderkey": "orderkey",
    "l_orderkey": "orderkey",
    "event_id": "event_id",
    "user_id": "user_id",
    "doc_id": "doc_id",
    "vec_id": "vec_id",
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    spark = get_session("scale-testdata")
    spark.sparkContext.setLogLevel("ERROR")

    for t in DIMS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"copied dim {t}")

    # spans from the source key maxima (+1 so shifted ranges never touch)
    spans: dict[str, int] = {}
    for t, cols in FACT_SHIFTS.items():
        df = load_table(spark, SRC, t)
        for c in cols:
            sp = SPAN_OF[c]
            mx = df.agg(F.max(c)).collect()[0][0] + 1
            spans[sp] = max(spans.get(sp, 0), mx)
    print("spans:", spans)

    for t, cols in FACT_SHIFTS.items():
        df = load_table(spark, SRC, t)
        parts = []
        for i in range(copies):
            d = df
            for c in cols:
                d = d.withColumn(c, F.col(c) + F.lit(i * spans[SPAN_OF[c]]))
            parts.append(d)
        big = parts[0]
        for d in parts[1:]:
            big = big.unionByName(d)
        dst = f"{out}/{t}.parquet"
        big.write.mode("overwrite").parquet(dst)
        print(f"wrote {t} x{copies}: {spark.read.parquet(dst).count()} rows")


if __name__ == "__main__":
    main()
