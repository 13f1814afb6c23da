"""Iterative graph algorithms over edge relations.

``connected_components`` (in ``functions.dedup``) assembles duplicate
clusters; this module adds PageRank — the authority score a curation
pipeline uses to pick the CANONICAL document inside a cluster (or to
weight a link/citation graph) when "lowest doc_id" is too arbitrary.

Same distributed discipline as the CC loop: every round is one join +
one aggregate on the edge relation, the driver sees only a convergence
scalar, and lineage is cut per round with ``localCheckpoint`` so the
plan does not grow with iterations.  No vertex ever reaches the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """PageRank over a directed edge relation; returns (node, rank),
    ranks summing to ~1.0.

    Standard damped formulation with dangling-node correction: nodes
    without out-edges redistribute their mass uniformly.  Stops early
    when the L1 delta between rounds drops below ``tol``.

    Exactly ONE driver action per round: the convergence probe is a
    single 1-row aggregate that returns both the L1 delta AND the next
    round's dangling mass (the rank relation carries the out-degree, so
    ``sum(rank where deg is null)`` folds into the same aggregate).
    The round-0 dangling mass needs no action at all — initial ranks
    are uniform ``1/n``, so it is ``n_dangling / n``, computed from the
    setup counts.  The driver only ever sees scalars, never rows.

    Plan per round: broadcast-free — contributions shuffle on ``dst``
    (one keyed aggregate), the rank relation stays partitioned by node,
    and ``localCheckpoint`` flattens lineage exactly like the
    connected-components loop (``functions/dedup.py:42``).
    """
    spark = edges.sparkSession
    prev_conf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    e = nodes = nodes_deg = None
    try:
        e = (
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .distinct()
            .persist()
        )
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
        n = nodes.count()  # scalar; the node count bounds every round
        if n == 0:
            # no edges -> no graph: an empty rank relation, not a
            # divide-by-zero (a dup-graph with zero near-dup pairs is a
            # normal curation outcome)
            return nodes.withColumn("rank", F.lit(0.0))
        outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
        # (node, deg) with deg NULL for dangling nodes — carried through
        # every rank relation so the convergence aggregate can fold the
        # next round's dangling mass into the same 1-row probe.
        nodes_deg = (
            nodes.join(outdeg, nodes.node == outdeg.src, "left")
            .select("node", "deg")
            .persist()
        )
        n_dangling = nodes_deg.filter(F.col("deg").isNull()).count()
        # round-0 ranks are uniform 1/n, so the dangling mass is exact
        # without touching the cluster
        dangling = n_dangling / n
        ranks = nodes_deg.withColumn("rank", F.lit(1.0 / n))
        for _ in range(max_iter):
            contrib = (
                e.join(
                    ranks.filter(F.col("deg").isNotNull()).select(
                        F.col("node").alias("src"),
                        (F.col("rank") / F.col("deg")).alias("share"),
                    ),
                    "src",
                )
                .groupBy("dst")
                .agg(F.sum("share").alias("in_mass"))
                .withColumnRenamed("dst", "node")
            )
            base = (1.0 - damping) / n + damping * dangling / n
            new_ranks = (
                nodes_deg.join(contrib, "node", "left")
                .select(
                    "node",
                    "deg",
                    (
                        F.lit(base)
                        + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
            # the ONLY action this round: L1 delta + next dangling mass
            # in one 1-row aggregate
            delta, dangling = (
                ranks.select("node", F.col("rank").alias("old"))
                .join(new_ranks, "node")
                .agg(
                    F.sum(F.abs(F.col("rank") - F.col("old"))).alias("d"),
                    F.coalesce(
                        F.sum(F.when(F.col("deg").isNull(), F.col("rank"))),
                        F.lit(0.0),
                    ).alias("dang"),
                )
                .collect()[0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        return ranks.select("node", "rank")
    finally:
        # unpersist in finally: a failed mid-loop action must not pin
        # the edge/node sets in executor storage for the session's life
        for cached in (e, nodes, nodes_deg):
            if cached is not None:
                cached.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", prev_conf)
