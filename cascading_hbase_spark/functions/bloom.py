"""Bloom-filter semi-join pruning: build a compact bitmap over the
small side's join keys, ship it to every task, and drop big-side rows
whose key cannot possibly match BEFORE the join — the runtime-filter
technique that turns "shuffle 100 TB to discover 1% matches" into
"shuffle 1%".

Reference parity note: the HBase connector gets this effect from
server-side row filtering (HBaseTap scans only requested ranges,
``TableInputFormatWrap.java``); on Spark the equivalent lever for
non-range predicates is a broadcast Bloom prune ahead of the join.

Design (deterministic, so the DuckDB oracle rebuilds the identical
bitmap):

- k positions per key: ``pos_i = hash64(str(i) + '#' + key) % m_bits``
  (``hash64`` is the shared md5-based 60-bit hash, mirrored by
  ``HASH64_SQL``; non-negative, so ``%`` agrees across engines).
- The bitmap is ``m_bits/32`` words, 32 bits per BIGINT word
  (positions ``word*32 .. word*32+31``).  32 not 64: the mask
  ``1 << (pos % 32)`` then never touches the sign bit, so Spark and
  DuckDB agree without two's-complement games.
- Build: explode keys × k positions → ``groupBy(word).agg(bit_or)``.
  One partial+final agg over the SMALL side only; the result is
  bounded by the constant ``m_bits/32`` rows, independent of data
  size.
- Probe, literal strategy (default, ``m_bits <= 2^17``): the bounded
  bitmap is collected once into an ARRAY<BIGINT> literal and the probe
  is a pure projection — ``element_at(bitmap, word+1) & mask == mask``
  for each of the k positions.  ZERO joins, zero exchanges on the
  probe side; whole-stage-codegen keeps it in one pass over the scan.
  (Same bounded-collect precedent as the IVF centroid table: the size
  is a constant of the algorithm, not of the data.)
- Probe, join strategy (large blooms): k broadcast hash joins
  word→bits.  A 1%-FPR bloom over 100 M keys needs ~2^30 bits
  (128 MB) — too big for a plan literal, fine as a broadcast table.

False positives are possible (classic Bloom guarantee: supersets,
never misses); the caller re-verifies with the real join, which now
runs on the pruned input.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from cascading_hbase_spark.functions.hashing import hash64

__all__ = ["bloom_build", "bloom_probe_flag", "bloom_prune"]

# Above this, the literal-array probe would bloat the plan; switch to
# broadcast word-table joins.
_LITERAL_MAX_BITS = 1 << 17


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    return [
        hash64(F.concat(F.lit(f"{i}#"), key.cast("string"))) % m_bits
        for i in range(k)
    ]


def _check_m_bits(m_bits: int) -> None:
    if m_bits <= 0 or m_bits % 32:
        raise ValueError(f"m_bits must be a positive multiple of 32, got {m_bits}")


def bloom_build(
    small: DataFrame, key: str, m_bits: int = 1 << 17, k: int = 3
) -> DataFrame:
    """Aggregate the small side's keys into a ``(word, bits)`` bitmap.
    NULL keys are dropped — a null never equality-matches in the join
    the bloom is pruning for (and a null position row would poison the
    bitmap)."""
    _check_m_bits(m_bits)
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos")
    return (
        small.filter(F.col(key).isNotNull()).select(pos)
        .select(
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def _probe_literal(
    big: DataFrame, key: str, bloom: DataFrame, m_bits: int, k: int, flag: str
) -> DataFrame:
    words = [0] * (m_bits // 32)
    for r in bloom.collect():  # bounded by m_bits/32, a constant
        words[r["word"]] = r["bits"]
    bitmap = F.lit(words)
    checks = []
    for pos in _positions(F.col(key), m_bits, k):
        word_bits = F.element_at(bitmap, (F.shiftright(pos, 5) + 1).cast("int"))
        # (bits >> (pos % 32)) & 1 == 1 — shift the word down instead of
        # building a mask, so the shift amount can be a Column.
        checks.append(
            _srl(word_bits, (pos % 32).cast("int")).bitwiseAND(F.lit(1)) == 1
        )
    passed = checks[0]
    for c in checks[1:]:
        passed = passed & c
    # a NULL probe key yields NULL checks; it can never equality-match,
    # so the flag is an explicit False, not NULL
    return big.withColumn(flag, F.coalesce(passed, F.lit(False)))


def _srl(col: Column, shift: Column) -> Column:
    """shiftright with a Column shift amount (the builtin only takes a
    Python int)."""
    return F.call_function("shiftright", col, shift)


def bloom_probe_flag(
    big: DataFrame,
    key: str,
    bloom: DataFrame,
    m_bits: int = 1 << 17,
    k: int = 3,
    flag: str = "bloom_pass",
    strategy: str = "auto",
) -> DataFrame:
    """Append a boolean ``flag`` column: True iff every one of the
    key's k bloom positions is set (False for a NULL key — it can
    never equality-match).  An existing column named ``flag`` is
    replaced.

    ``strategy='literal'``: bitmap as an array literal, pure map-side
    projection (zero joins).  ``'join'``: k broadcast hash joins (for
    blooms too big to inline).  ``'auto'`` picks by ``m_bits``."""
    _check_m_bits(m_bits)
    if strategy == "auto":
        strategy = "literal" if m_bits <= _LITERAL_MAX_BITS else "join"
    if strategy == "literal":
        return _probe_literal(big, key, bloom, m_bits, k, flag)

    out = big
    checks = []
    for i, pos in enumerate(_positions(F.col(key), m_bits, k)):
        w = bloom.select(
            F.col("word").alias(f"_bw{i}"), F.col("bits").alias(f"_bb{i}")
        )
        out = out.withColumn(f"_bp{i}", pos).join(
            F.broadcast(w),
            F.shiftright(F.col(f"_bp{i}"), 5) == F.col(f"_bw{i}"),
            "left",
        )
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_bp{i} % 32 AS INT))")
        checks.append(
            F.col(f"_bb{i}").isNotNull()
            & (F.col(f"_bb{i}").bitwiseAND(mask) == mask)
        )
    passed = checks[0]
    for c in checks[1:]:
        passed = passed & c
    drop = [c for i in range(k) for c in (f"_bp{i}", f"_bw{i}", f"_bb{i}")]
    return out.withColumn(flag, passed).drop(*drop)


def bloom_prune(
    big: DataFrame,
    key: str,
    small: DataFrame,
    small_key: str,
    m_bits: int = 1 << 17,
    k: int = 3,
    strategy: str = "auto",
) -> DataFrame:
    """Filter ``big`` to rows whose ``key`` might appear in
    ``small[small_key]`` (superset of the exact semi-join)."""
    bloom = bloom_build(small.select(small_key), small_key, m_bits, k)
    # collision-safe internal flag: never clobber a user column
    flag = "_bloom_pass"
    while flag in big.columns:
        flag += "_"
    flagged = bloom_probe_flag(big, key, bloom, m_bits, k, flag=flag, strategy=strategy)
    return flagged.filter(F.col(flag)).drop(flag)
