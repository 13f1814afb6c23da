"""§2.7 window functions: ranking, analytic (lag/lead), aggregates over
frames.  Absent in the MR-era reference; first-class engine surface here
(SURVEY.md §2.7) and used internally by last-write-wins and top-k.

Frame aggregates over doubles use the exact-DECIMAL trick: DuckDB
evaluates window sums with a segment tree (pairwise order), Spark
streams the frame — only exact decimal arithmetic hash-matches."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cascading_hbase_spark.catalog import load_table
from cascading_hbase_spark.queries import query


@query(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           round(percent_rank() OVER w, 6) AS prnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(event_type, 2) OVER w AS prev2_type
    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("event_type", 2).over(w).alias("prev2_type"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS BIGINT) AS seq
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(frame).cast("double").alias("running_total"),
        F.row_number().over(w).cast("bigint").alias("seq"),
    )


@query(
    "window_moving_agg",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS win_sum,
           CAST(count(*) OVER w AS BIGINT) AS win_n
    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding row-frame aggregate (moving sum over the trailing 3
    events per user)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("win_sum"),
        F.count("*").over(w).cast("bigint").alias("win_n"),
    )


@query(
    "window_ntile_firstlast",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ntile_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(wfull).alias("last_ok"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS value_last_hour
    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE frame (not row-count): per user, each event's count
    and exact-decimal value sum over the trailing hour of *event time*.
    The frame bound is on microseconds-since-epoch, so both engines
    resolve identical peer sets; a rows-frame would silently change
    meaning wherever events cluster.  One shuffle (the user_id window
    partitioning), state streams per partition."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count("*").over(w).cast("bigint").alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("value_last_hour"),
    )


@query(
    "window_cume_dist",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — relative standing within a partition
    (the distribution-aware window pair missing from rank/ntile)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "window_ratio_to_report",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice /
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                      OVER (PARTITION BY l_returnflag) AS DOUBLE),
                 12) AS price_share
    FROM lineitem
    WHERE l_orderkey < 2000
    """,
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each row's share of its group total — the
    whole-partition (no ORDER BY) window frame.  The denominator sums
    as exact DECIMAL so both engines divide by bit-identical totals;
    one shuffle on the partition key."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    w = Window.partitionBy("l_returnflag")
    total = F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).over(w)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") / total.cast("double"), 12
        ).alias("price_share"),
    )


@query(
    "window_count_distinct",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT CAST(count(DISTINCT s.event_type) AS BIGINT) FROM ev s
            WHERE s.user_id = e.user_id
              AND (s.ts < e.ts OR (s.ts = e.ts AND s.event_id <= e.event_id)))
             AS types_seen
    FROM ev e
    """,
)
def window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over a window — an operator Spark's SQL
    window functions don't offer (DISTINCT aggregates are rejected in
    OVER clauses): composed as ``size(collect_set(...))`` over the
    running frame.  One shuffle on user_id; the set state is bounded by
    the event-type cardinality, not the row count.  The oracle is the
    correlated-subquery formulation."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.size(F.collect_set("event_type").over(w)).cast("bigint").alias("types_seen"),
    )


@query(
    "max_drawdown_per_user",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    r AS (
      SELECT user_id, value,
             MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM ev
    )
    SELECT user_id,
           CAST(round(MIN(value / peak - 1.0), 6) AS DOUBLE) AS max_drawdown
    FROM r WHERE peak > 0.0
    GROUP BY user_id
    """,
)
def max_drawdown_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user: the worst peak-to-trough drop of the
    event value sequence (value / running-max - 1, minimized) — the
    classic risk/quality metric computed as a running-peak window plus
    one aggregate.  One shuffle on user_id; the running MAX frame is
    O(1) state per row (monotone), and the final per-user MIN is a
    partial+final agg — nothing here is quadratic in events-per-user."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select("user_id", "value", F.max("value").over(w).alias("peak"))
        .filter(F.col("peak") > 0.0)
        .groupBy("user_id")
        .agg(
            F.round(F.min(F.col("value") / F.col("peak") - 1.0), 6).alias(
                "max_drawdown"
            )
        )
    )


@query(
    "mode_per_group_deterministic",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_event, cnt
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY cnt DESC, event_type) AS rn FROM c)
    WHERE rn = 1
    """,
)
def mode_per_group_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group with a DETERMINISTIC tie-break
    (highest count, then lexicographically smallest value) — built-in
    ``mode()``/``max_by()`` leave ties engine- and partition-order-
    dependent, which is exactly what a reproducible pipeline cannot
    have.  Count-then-rank: the count aggregate shrinks the relation to
    (group x value) BEFORE the rank window, so the window sorts the
    small counted relation, never the raw events."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), "event_type")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event"), "cnt")
    )
