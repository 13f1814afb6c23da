"""Skew helpers must be semantically invisible: salted results equal
unsalted ones exactly; the HLL sketch stays within its error bound."""

from __future__ import annotations

import pyspark.sql.functions as F

from cascading_hbase_spark.catalog import load_table
from cascading_hbase_spark.functions.skew import salted_join, salted_two_phase_agg

SF = "/root/testdata/sf0.001"


def test_salted_agg_equals_plain(spark):
    li = load_table(spark, SF, "lineitem")
    got = salted_two_phase_agg(
        li, ["l_returnflag"], {"n": ("count", "l_quantity"), "mx": ("max", "l_extendedprice")}
    )
    want = li.groupBy("l_returnflag").agg(
        F.count("l_quantity").alias("n"), F.max("l_extendedprice").alias("mx")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_equals_plain(spark):
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    got = salted_join(o, c, ["o_custkey"]).select("o_orderkey", "c_nationkey")
    want = o.join(c, "o_custkey").select("o_orderkey", "c_nationkey")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_skew_policy_aqe_vs_salting(spark):
    """Executable form of the functions/skew.py policy.

    (a) Join skew is DELEGATED: the engine session runs with AQE's
    skew-join splitter on, so plain joins are the default.
    (b) Aggregation skew is NOT AQE's problem: a hot group key's final
    aggregate is one reducer task no matter what AQE does, while the
    salted phase-1 provably spreads the same hot key over multiple
    (key, salt) cells — the structural fact salting exists for."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

    # one hot key carrying ~90% of rows
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    df = hot.unionByName(cold)

    # (b) structural spread: phase 1 of the salted agg materializes the
    # hot key as n_salt partial cells (AQE offers no counterpart here)
    n_salt = 8
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salt).cast("int"))
    phase1 = salted.groupBy("k", "_salt").agg(F.sum("v").alias("s"))
    hot_cells = phase1.filter(F.col("k") == "hot").count()
    assert hot_cells > 1, "hot key did not spread across salt cells"

    # salting stays semantically invisible on the skewed input
    got = salted_two_phase_agg(df, ["k"], {"s": ("sum", "v"), "n": ("count", "v")})
    want = df.groupBy("k").agg(F.sum("v").alias("s"), F.count("v").alias("n"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_approx_distinct_within_bound(spark):
    li = load_table(spark, SF, "lineitem")
    approx = li.agg(F.approx_count_distinct("l_orderkey", rsd=0.02)).first()[0]
    exact = li.select("l_orderkey").distinct().count()
    assert abs(approx - exact) / exact < 0.1


def test_connected_components_chain(spark):
    """A chain a-b, b-c, d-e must form clusters {a,b,c} and {d,e} with
    min-id labels, independent of pair order."""
    from cascading_hbase_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (5, 4), (7, 8), (6, 7)], "doc_a long, doc_b long"
    )
    got = {(r.doc_id, r.cluster_id) for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6), (7, 6), (8, 6)}
