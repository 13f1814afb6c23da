"""Text-cleaning operators on crafted dirty input."""

from __future__ import annotations

import pyspark.sql.functions as F

from cascading_hbase_spark.functions import text as T


def test_clean_pipeline_redacts_and_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hi <b>there</b>  mail a.b@x.co or see https://x.co/p?q=1 \t ok")],
        "doc_id long, text string",
    )
    out = df.select(
        T.normalize_ws(T.redact_pii(T.strip_html(F.col("text")))).alias("c")
    ).first().c
    assert out == "Hi there mail <EMAIL> or see <URL> ok"


def test_strip_html_tags(spark):
    df = spark.createDataFrame([(1, "say <b>bold</b> and <i>italic</i>.")], "id long, text string")
    assert df.select(T.strip_html(F.col("text")).alias("c")).first().c == "say  bold  and  italic ."
