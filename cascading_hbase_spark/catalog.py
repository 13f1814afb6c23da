"""Table catalog: load the driver-generated parquet tables for a scale
factor and register them as temp views.

Mirrors the reference's tap-binding step (``HBaseTap.java:135-139`` binds
a table name into the job conf) — here a table name binds to a parquet
path and Catalyst's DataSource handles splits, pushdown, and pruning
(reference did this by hand in ``TableInputFormatWrap.java:40-82``).
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "load_table", "load_all", "register_views", "default_sf_dir"]

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Split key per table for the unsplittable-input repartition below:
# chosen as the commonest downstream grouping/join key so the forced
# exchange doubles as useful co-location (per-customer windows,
# per-doc aggregates, orderkey joins reuse the partitioning or at
# least group locally).  Every key is near-unique or uniform, so hash
# balance is a non-issue.  A table whose value is None is NOT
# repartitioned: measured per-query A/B (tools/ab_split_fix.py,
# OPTIMIZATION_r13.md) showed the extra exchange loses whenever the
# downstream reduction is already cheap map-side and no later operator
# reuses the key — events' tumbling-window aggregate being the clear
# case (-64% from an exchange nothing downstream reuses).
_SPLIT_KEYS: dict[str, str | None] = {
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
    "orders": "o_custkey", "lineitem": "l_orderkey",
    "events": None, "documents": "doc_id", "embeddings": "vec_id",
}


def _split_spec() -> dict[str, str | None]:
    """Optional env override for A/B experiments:
    ``SPARK_GRAFT_SPLIT_SPEC="lineitem:l_orderkey,events:off"``."""
    spec = os.environ.get("SPARK_GRAFT_SPLIT_SPEC")
    if not spec:
        return _SPLIT_KEYS
    out = dict(_SPLIT_KEYS)
    for item in spec.split(","):
        t, _, k = item.partition(":")
        out[t.strip()] = None if k.strip() in ("off", "") else k.strip()
    return out

# path -> rows-per-row-group deficit decision, cached so repeated
# load_table calls don't re-read footers.
_LAYOUT_CACHE: dict[str, bool] = {}

# A parquet scan parallelizes at row-group granularity; below this many
# rows per available split the serial tail is trivial and the shuffle
# isn't worth it.
_MIN_ROWS_PER_SPLIT = 8192


def _scan_is_split_starved(path: str, parallelism: int) -> bool:
    """True when the parquet layout cannot produce enough scan splits
    to use the cluster — e.g. the driver testdata's single-file,
    single-row-group tables, or any one huge unsplittable file (guide
    §2.5: fix at the source or repartition immediately after the
    read).  Row groups are parquet's split atom, so splits <=
    total row groups.  Local paths only: a scheme URI (object store)
    is assumed production-laid-out, and a real deployment's files have
    many row groups, so this returns False there and the repartition
    never fires at scale."""
    if os.environ.get("SPARK_GRAFT_SPLIT_STARVED_FIX", "1") == "0":
        return False  # explicit opt-out (A/B measurement, debugging)
    if "://" in path:
        return False
    cached = _LAYOUT_CACHE.get(path)
    if cached is not None:
        return cached
    try:
        import pyarrow.parquet as pq

        files = [path] if os.path.isfile(path) else sorted(
            glob.glob(os.path.join(path, "*.parquet"))
        )
        row_groups = rows = 0
        starved = False
        if files and len(files) < parallelism:
            for f in files[:64]:
                md = pq.ParquetFile(f).metadata
                row_groups += md.num_row_groups
                rows += md.num_rows
            starved = (
                row_groups < parallelism
                and rows // max(row_groups, 1) >= _MIN_ROWS_PER_SPLIT
            )
    except Exception:
        starved = False
    _LAYOUT_CACHE[path] = starved
    return starved


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The harness may hand us a vanilla session; pin the timestamp
    # semantics our queries (and the DuckDB oracle) assume.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")

    def _parallelize(df: DataFrame) -> DataFrame:
        # Unsplittable-input fix (guide §2.5): a single-row-group file
        # pins every scan-rooted map stage to ONE core; repartition by
        # the table's natural key immediately after the read.  Key
        # hash (no sort-before-repartition cost, deterministic under
        # task retry) and results are partitioning-invariant — the
        # whole registry is order-insensitive by construction (hash
        # sampling, sorted collect_lists, total tie-breaks).  No-op on
        # production-shaped inputs (see _scan_is_split_starved).
        key = _split_spec().get(name)
        par = spark.sparkContext.defaultParallelism
        if key is not None and _scan_is_split_starved(path, par):
            return df.repartition(par, F.col(key))
        return df

    if name == "events":
        # events.ts arrives with a physical type that varies by how the
        # driver generated the parquet (TIMESTAMP(NANOS) -> bigint under
        # nanosAsLong, or TIMESTAMP_NTZ).  Normalize every variant to a
        # plain session-UTC TIMESTAMP — the dtype all oracles were
        # validated against, and the one time functions like
        # ``unix_micros`` accept.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _parallelize(spark.read.parquet(path))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # NTZ -> TZ is wall-clock-preserving under the pinned UTC
            # session zone.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return _parallelize(spark.read.parquet(path))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` works too."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
