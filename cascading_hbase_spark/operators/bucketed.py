"""Bucketed tables for shuffle-free co-located joins.

The reference co-locates work by storing tables key-sorted in regions
and scheduling a task per region (TableInputFormatWrap.java:40-82).
The Spark-native analogue for *join* co-location is bucketing: both
sides hash-bucketed on the join key into the same number of buckets at
write time, so a sort-merge join reads matching buckets pairwise and
needs NO Exchange on either side — at 100 TB this removes the two
largest shuffles in any fact-fact join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "colocated_join"]


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16
) -> None:
    """Persist as a bucketed+sorted managed table (bucket pruning and
    shuffle-free joins for every consumer that joins/aggregates on
    ``key``)."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left: str, right: str, on: list[str] | str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    plan contains no Exchange (verified in tests).  The merge hint
    keeps Catalyst from broadcasting small test fixtures so the
    co-location property is what executes."""
    return spark.table(left).join(spark.table(right).hint("merge"), on, how)
