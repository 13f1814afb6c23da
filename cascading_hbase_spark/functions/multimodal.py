"""Multimodal column operators: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched Pandas UDFs.

The reference stores cells as raw ``byte[]`` (HBaseScheme.java:101-102)
— the engine keeps that escape hatch as first-class ``BinaryType``
columns and adds the processing surface a training-data pipeline needs:
decode, feature-extract, resize, frame-sample.

Scale design (the part that must hold at 100 TB):

- payloads stay opaque bytes end-to-end; nothing ever collects to the
  driver, and every operator is a stateless ``DataFrame -> DataFrame``
  map — embarrassingly parallel over input partitions, no shuffle.
- Python touches bytes only through ``mapInPandas`` (Arrow batches),
  never row-at-a-time UDFs; metadata-only transforms (resize targets,
  frame index generation) stay JVM-side as column expressions.
- 1→N frame sampling is an ``explode`` over a JVM-generated index
  array, so output row count scales without Python in the loop.

The actual media decoding (PIL/librosa/av) is NOT available in this
container: ``decode=real`` raises ``NotImplementedError`` via an
import-try gate, and the default ``decode=fake`` computes deterministic
byte-level features (length, per-byte mean/min/max) so the plumbing —
schema, batching, partitioning, UDF signature — is fully testable and
DuckDB-oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Literal

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "attach_payload",
    "image_features",
    "resize_plan",
    "frame_sample",
    "frame_slices",
    "audio_stats",
]

MODALITIES = ("image", "audio", "video")


def _real_decoder():
    """Import the real media stack; absent in this environment."""
    try:
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "real media decode needs PIL/librosa/av, which are not "
            "installed; use decode='fake' (deterministic byte features)"
        ) from exc


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Attach a deterministic synthetic ``payload`` binary column plus a
    typed ``meta`` struct, emulating ingested media.

    payload = unhex(repeat(md5(text), 1 + id % 3)) — 16/32/48 opaque
    bytes; meta carries modality / width / height / n_frames /
    sample_rate derived from the id.  Deterministic by construction so
    the DuckDB oracle can reproduce it bit-for-bit.
    """
    i = F.col(id_col)
    meta = F.struct(
        F.element_at(F.array(*[F.lit(m) for m in MODALITIES]), (i % 3 + 1).cast("int")).alias("modality"),
        (F.lit(64) + (i % 8) * 32).cast("int").alias("width"),
        (F.lit(64) + (i % 5) * 32).cast("int").alias("height"),
        (F.lit(8) + i % 24).cast("int").alias("n_frames"),
        F.element_at(F.array(F.lit(8000), F.lit(16000), F.lit(44100)), (i % 3 + 1).cast("int")).alias("sample_rate"),
    )
    payload = F.unhex(F.repeat(F.md5(F.col(text_col)), (i % 3 + 1).cast("int")))
    return df.withColumn("payload", payload).withColumn("meta", meta)


def image_features(
    df: DataFrame,
    id_col: str,
    decode: Literal["fake", "real"] = "fake",
) -> DataFrame:
    """Per-payload byte features via ``mapInPandas`` (Arrow batches).

    Output: (id, n_bytes, mean_byte, min_byte, max_byte).  With
    ``decode='real'`` this is where PIL decode + pixel stats would run
    per batch; the container has no media libs, so that path raises
    NotImplementedError and 'fake' computes the same-shaped features
    from the raw bytes.
    """
    if decode == "real":
        _real_decoder()
    schema = f"{id_col} long, n_bytes int, mean_byte double, min_byte int, max_byte int"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized over the whole Arrow batch: concatenate payloads
        # into one uint8 view and compute per-payload sums/min/max with
        # segmented reduceat — C-speed regardless of payload count.
        # Payloads are non-empty by construction (>= 16 bytes).
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            payloads = [bytes(b) for b in pdf["payload"]]
            lens = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=n)
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sums = np.add.reduceat(flat.astype(np.int64), starts)
            mins = np.minimum.reduceat(flat, starts)
            maxs = np.maximum.reduceat(flat, starts)
            # Python round() per row matches the previous per-row path
            # bit-for-bit; it is one float op per payload, not per byte.
            means = [round(s / ln, 6) for s, ln in zip(sums.tolist(), lens.tolist())]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_bytes": lens.astype(np.int32),
                    "mean_byte": means,
                    "min_byte": mins.astype(np.int32),
                    "max_byte": maxs.astype(np.int32),
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, schema)


def resize_plan(df: DataFrame, id_col: str, target: int = 224) -> DataFrame:
    """Resize bookkeeping, JVM-side only: compute the scale factor and
    output dims that the (stubbed) pixel resize would apply.  The pixel
    work itself belongs in ``image_features``-style ``mapInPandas``."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.lit(float(target)) / F.greatest(w, h).cast("double")
    return df.select(
        F.col(id_col),
        F.col("meta.modality").alias("modality"),
        w.alias("width"),
        h.alias("height"),
        F.round(scale, 6).alias("scale"),
        F.round(w.cast("double") * scale).cast("int").alias("out_w"),
        F.round(h.cast("double") * scale).cast("int").alias("out_h"),
    )


def frame_sample(df: DataFrame, id_col: str, stride: int = 4) -> DataFrame:
    """1→N video frame sampling: explode every ``stride``-th frame index
    from the metadata.  Pure JVM explode — Python never sees the rows —
    so it scales as a map-side flatMap."""
    frames = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(stride))
    return (
        df.filter(F.col("meta.modality") == "video")
        .select(F.col(id_col), F.col("meta.n_frames").alias("n_frames"),
                F.explode(frames).alias("frame_idx"))
    )


def frame_slices(df: DataFrame, id_col: str, stride: int = 4) -> DataFrame:
    """1→N frame sampling WITH the frame's bytes: each sampled frame
    index carries its byte slice of the payload (``substring`` on
    binary — pure JVM, no Python touches the bytes).  Only full-width
    slices are emitted, so the contract has no ragged-tail edge cases.
    Output: (id, frame_idx, frame_bytes, frame_hex)."""
    v = (
        df.filter(F.col("meta.modality") == "video")
        .select(
            F.col(id_col),
            "payload",
            F.col("meta.n_frames").alias("n_frames"),
            F.length("payload").alias("n_bytes"),
        )
        .withColumn("frame_bytes", F.expr("greatest(1, n_bytes div n_frames)"))
    )
    ex = v.select(
        id_col,
        "payload",
        "n_bytes",
        "frame_bytes",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))
        ).alias("frame_idx"),
    ).filter((F.col("frame_idx") + 1) * F.col("frame_bytes") <= F.col("n_bytes"))
    return ex.select(
        F.col(id_col),
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("frame_bytes").cast("int").alias("frame_bytes"),
        F.hex(
            F.expr("substring(payload, 1 + frame_idx * frame_bytes, frame_bytes)")
        ).alias("frame_hex"),
    )


def audio_stats(df: DataFrame, id_col: str) -> DataFrame:
    """Audio metadata stats: treat payload bytes as 8-bit samples;
    duration = n_bytes / sample_rate.  JVM-side arithmetic on length +
    metadata (no Python)."""
    sr = F.col("meta.sample_rate")
    n = F.length("payload")
    return (
        df.filter(F.col("meta.modality") == "audio")
        .select(
            F.col(id_col),
            sr.alias("sample_rate"),
            n.cast("int").alias("n_samples"),
            F.round(n.cast("double") / sr.cast("double"), 6).alias("duration_sec"),
        )
    )
