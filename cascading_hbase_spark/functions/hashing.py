"""Deterministic 60-bit hash shared by Spark and the DuckDB oracle.

``hash64(s) = int(md5(s)[:15], 16)`` — md5 is available and identical
in both engines, and 15 hex digits (60 bits) always fit a signed
BIGINT, so minhash/simhash signatures are bit-identical across engines.
Spark's native ``xxhash64`` would be faster but has no DuckDB twin; for
production scale swap ``hash64`` for ``F.xxhash64`` (one-line change —
the operators only need *a* stable 64-bit hash)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = ["hash64", "HASH64_SQL"]

# DuckDB-side template: format with the input SQL expression.
HASH64_SQL = "CAST(('0x' || substring(md5({x}), 1, 15)) AS BIGINT)"


def hash64(col: Column | str) -> Column:
    """60-bit non-negative deterministic hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")
