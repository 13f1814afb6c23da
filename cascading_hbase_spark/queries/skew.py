"""Skew-mitigation query pairs: the salted forms return results
identical to their unsalted equivalents, so the oracle is the plain
SQL — what's under test is that the skew-safe physical strategy
preserves exact semantics."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cascading_hbase_spark.catalog import load_table
from cascading_hbase_spark.functions.skew import salted_join, salted_two_phase_agg
from cascading_hbase_spark.queries import query


@query(
    "salted_two_phase_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(max(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def salted_two_phase_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a low-cardinality (maximally skewed) key via
    salting: phase 1 spreads each hot key over 16 salt reducers,
    phase 2 merges partials.  Values match the direct groupBy."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "qty_dec", F.col("l_quantity").cast("decimal(18,2)")
    )
    out = salted_two_phase_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("sum", "qty_dec"),
            "n_rows": ("count", "l_quantity"),
            "max_price": ("max", "l_extendedprice"),
        },
        n_salt=16,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "n_rows",
        "max_price",
    )


@query(
    "salted_join_rollup",
    oracle="""
    SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
)
def salted_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe equi-join (salted big side, replicated small side)
    followed by a rollup; identical rows to the plain join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    joined = salted_join(o, c, ["o_custkey"], n_salt=16)
    return joined.groupBy("c_nationkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@query(
    "approx_distinct_sketch",
    # The sketch estimate itself can't be reproduced in DuckDB (different
    # HLL implementation), but its documented accuracy contract CAN be
    # checked exactly: the oracle computes the exact distinct count and
    # asserts the estimate fell within 5x the configured rsd (a >5-sigma
    # band — deterministic-in-practice for HLL++'s guarantees).  Spark
    # emits the measured boolean; hash equality fails iff the sketch
    # blows its bound.
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(1 AS BOOLEAN) AS within_rsd_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct per group — the sketch path
    for 100 TB cardinality estimation.  Emits the exact count (hash-
    matched) plus ``within_rsd_bound``: |approx - exact| / exact <=
    5*rsd, the sketch's checkable accuracy contract."""
    li = load_table(spark, sf_dir, "lineitem")
    rsd = 0.02
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=rsd).alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count("*").alias("n_rows"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "n_rows",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= 5 * rsd
        ).alias("within_rsd_bound"),
    )
