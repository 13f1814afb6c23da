"""Multimodal binary-column plumbing: payload determinism, the
real-decode import gate, and the 1→N frame-sample shape."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from cascading_hbase_spark.catalog import load_table
from cascading_hbase_spark.functions import multimodal as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def payload_df(spark):
    d = load_table(spark, SF, "documents").select("doc_id", "text")
    return M.attach_payload(d, "doc_id", "text").cache()


def test_payload_is_binary_and_deterministic(spark, payload_df):
    f = dict(payload_df.dtypes)
    assert f["payload"] == "binary"
    row = payload_df.filter(F.col("doc_id") == 1).select("payload", "meta").first()
    # doc_id=1 -> k=2 repeats of the 16-byte md5 digest.
    assert len(row.payload) == 32
    assert row.payload[:16] == row.payload[16:]
    assert row.meta.modality == "audio"  # 1 % 3 == 1


def test_image_features_real_decode_gated(payload_df):
    with pytest.raises(NotImplementedError, match="decode"):
        M.image_features(payload_df, "doc_id", decode="real").collect()


def test_frame_sample_stride(spark, payload_df):
    out = M.frame_sample(payload_df, "doc_id", stride=4)
    rows = out.filter(F.col("doc_id") == 2).orderBy("frame_idx").collect()
    # doc_id=2 -> video, n_frames = 8 + 2 = 10 -> frames 0,4,8
    assert [r.frame_idx for r in rows] == [0, 4, 8]
    assert all(r.n_frames == 10 for r in rows)


def test_audio_stats_only_audio_rows(spark, payload_df):
    out = M.audio_stats(payload_df, "doc_id")
    ids = [r.doc_id for r in out.collect()]
    assert ids and all(i % 3 == 1 for i in ids)
