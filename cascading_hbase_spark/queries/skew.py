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


@query("approx_distinct_sketch")  # no oracle: HLL++ sketch differs from DuckDB's
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct per group — the sketch path
    for 100 TB cardinality estimation (pytest bounds its error vs the
    exact count)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.count("*").alias("n_rows"),
    )
