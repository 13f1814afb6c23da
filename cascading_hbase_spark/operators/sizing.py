"""Output file sizing: write parquet with files near a target size.

The 100 TB small-files problem in one utility: a shuffle-heavy job's
natural output partitioning says nothing about FILE sizes, and both
failure modes hurt — thousands of KB-sized files grind the next job's
split planning and any metastore; multi-GB files kill read parallelism
and retry granularity.  Engines with managed tables auto-compact;
for a plain parquet sink the writer has to size its own output.

``write_sized_parquet`` measures the ACTUAL compressed bytes/row of a
bounded sample (schema-dependent encodings make any static estimate
wrong by 10x), derives rows-per-file for the target, and writes with
``repartition(n_files)`` + ``maxRecordsPerFile`` (the repartition sets
the parallelism floor; the option caps stragglers if the estimate ran
low).  Cost: one bounded sample write + one count — the sizing tax,
only worth paying on sinks that downstream jobs re-read many times."""

from __future__ import annotations

import math
import os
import shutil
import tempfile

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame

__all__ = ["write_sized_parquet", "estimate_bytes_per_row"]


def _is_missing_path(e: AnalysisException) -> bool:
    """Path-does-not-exist / nothing-to-infer analysis errors — the
    only ones the append pre-listing may treat as "fresh path"."""
    cond = getattr(e, "getCondition", None) or getattr(e, "getErrorClass", None)
    name = cond() if cond else ""
    if name in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
        return True
    msg = str(e)
    return "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg


def estimate_bytes_per_row(df: DataFrame, sample_rows: int = 10_000) -> float:
    """Compressed parquet bytes per row, measured by writing a bounded
    sample (``limit`` — cheap, no full scan) to a temp dir.  Sampling
    the head slightly biases toward whatever the head looks like;
    callers wanting distribution-robust estimates should pre-shuffle
    or pass a larger sample.

    Single-host/shared-FS assumption: the sample is written through
    Spark but its file sizes are read with ``os.listdir`` on the
    DRIVER, so the temp dir must be visible to both — true in local
    mode and on clusters whose scratch space is a shared mount (the
    same assumption ``keyed/table.py`` documents for its manifest
    paths).  On a multi-node cluster with node-local disks, point
    ``tempfile.tempdir`` at a shared location, or port the byte count
    to a ``spark.read`` of the written footers."""
    tmp = tempfile.mkdtemp(prefix="kt_sizing_")
    try:
        sample = df.limit(sample_rows)
        path = os.path.join(tmp, "sample")
        sample.coalesce(1).write.mode("overwrite").parquet(path)
        # count what was WRITTEN (footer metadata, ~free) — re-counting
        # df.limit() would re-run the upstream plan and, for
        # order-undefined limits, could count a different row set than
        # the one measured on disk
        n = df.sparkSession.read.parquet(path).count()
        if n == 0:
            raise ValueError("cannot size an empty DataFrame")
        nbytes = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        return nbytes / n
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def write_sized_parquet(
    df: DataFrame,
    path: str,
    target_mb: float = 128.0,
    sample_rows: int = 10_000,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as parquet with files sized ~``target_mb``.

    Returns the sizing decision ``{"bytes_per_row", "rows_per_file",
    "n_files", "n_rows"}`` for observability/logging.  Exact file
    sizes still vary with compression locality (sorted runs compress
    better than the sample suggests) — this targets the right ORDER of
    file size, which is what split planning cares about.

    Non-deterministic inputs (``rand()``, sampling, a changing
    source): the decision evaluates ``df`` three times (sample,
    planning count, final write), and pinning the full input first
    would defeat the point of a SIZING utility (an eager checkpoint
    materializes the whole 100 TB-class sink input into executor
    storage).  Instead the returned ``n_rows``/``n_files`` are read
    from what was ACTUALLY WRITTEN, so the observability record is
    always truthful; only the bytes/row estimate and the planning
    count may then come from a different evaluation, which degrades
    file-size accuracy, never correctness.

    Under ``mode="append"`` the record covers THIS BATCH only —
    ``n_files``/``n_rows`` are computed over the files the write added
    (pre/post ``inputFiles()`` diff), not the cumulative directory;
    ``dir_n_files`` carries the directory-wide total split planning
    sees.  The post-write count reads only the new files' row-group
    metadata (a footer pass, cheap but not free — it lists and opens
    every new file once)."""
    spark = df.sparkSession
    bpr = estimate_bytes_per_row(df, sample_rows)
    target_bytes = target_mb * 1024 * 1024
    rows_per_file = max(1, int(target_bytes / bpr))
    n_planned = df.count()
    n_files_planned = max(1, math.ceil(n_planned / rows_per_file))
    before: set[str] = set()
    if mode == "append":
        # only append needs the pre-write listing (to diff the batch
        # out afterwards) — overwrite must not pay a full listing +
        # footer pass of data it is about to delete
        try:
            before = set(spark.read.parquet(path).inputFiles())
        except AnalysisException as e:
            # only the genuinely-empty cases mean "first write into a
            # fresh path"; a transient read failure on an existing
            # populated directory (corrupt footer, permissions) must
            # propagate, or every pre-existing file would be counted
            # as this batch's output
            if not _is_missing_path(e):
                raise
            before = set()
    (
        df.repartition(n_files_planned)
        .write.option("maxRecordsPerFile", rows_per_file)
        .mode(mode)
        .parquet(path)
    )
    # report the written reality, not the plan: actual file listing +
    # footer row counts (maxRecordsPerFile can split beyond the plan,
    # and a non-deterministic input can change cardinality between the
    # planning count and the write).  inputFiles(), not os.listdir:
    # engine-side, so no shared-FS assumption here.
    all_files = spark.read.parquet(path).inputFiles()
    new_files = [f for f in all_files if f not in before] if mode == "append" else list(all_files)
    n_rows = spark.read.parquet(*new_files).count() if new_files else 0
    return {
        "bytes_per_row": bpr,
        "rows_per_file": rows_per_file,
        "n_files": len(new_files),
        "n_rows": n_rows,
        "dir_n_files": len(all_files),
    }
