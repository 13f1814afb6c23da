"""Shared Spark-vs-DuckDB parity checker: the strictest plausible
reading of the driver's t2 gate (row count + column names + exact
order-insensitive values)."""

from __future__ import annotations

import duckdb
import pandas as pd

from cascading_hbase_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_col(s: pd.Series, other: pd.Series) -> pd.Series:
    """Normalize one column given the dtype of its counterpart.

    Integer columns stay exact (nullable Int64) when BOTH sides are
    integer — float64 would silently equate 60-bit hash values differing
    below 2^53.  The float path only applies when either side is
    genuinely floating-point (cross-engine int/double width drift)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        try:
            s = s.dt.tz_localize(None)
        except TypeError:
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        return s.astype("datetime64[us]").astype(str)
    if pd.api.types.is_float_dtype(s) or (
        pd.api.types.is_integer_dtype(s) and pd.api.types.is_float_dtype(other)
    ):
        return s.astype("float64")
    if pd.api.types.is_integer_dtype(s):
        return s.astype("Int64")
    if s.dtype == object:
        return s.astype(str)
    return s


def _normalize(df: pd.DataFrame, other: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # A column missing on the counterpart (callers outside compare()
        # may skip its column-set gate) normalizes against itself rather
        # than raising KeyError.
        df[c] = _norm_col(df[c], other[c] if c in other.columns else df[c])
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, duck_df: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    sp = spark_df.toPandas()
    problems: list[str] = []
    if sorted(sp.columns) != sorted(duck_df.columns):
        problems.append(f"columns: spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(sp) != len(duck_df):
        problems.append(f"rowcount: spark={len(sp)} duck={len(duck_df)}")
        return problems
    a, b = _normalize(sp, duck_df), _normalize(duck_df, sp)
    for c in a.columns:
        ca, cb = a[c], b[c]
        if pd.api.types.is_float_dtype(ca) and pd.api.types.is_float_dtype(cb):
            eq = (ca.fillna(-1.23e300) == cb.fillna(-1.23e300)).all()
        elif pd.api.types.is_integer_dtype(ca) and pd.api.types.is_integer_dtype(cb):
            # fillna(False): nullable-boolean .all() skips NA, which
            # would silently pass NULL-vs-value mismatches
            eq = bool(((ca == cb) | (ca.isna() & cb.isna())).fillna(False).all())
        else:
            # .where, not .fillna: object-dtype fillna triggers the
            # pandas silent-downcasting FutureWarning (removal slated
            # for pandas 3.x)
            eq = (ca.astype("object").where(ca.notna(), "<NULL>").astype(str)
                  == cb.astype("object").where(cb.notna(), "<NULL>").astype(str)).all()
        if not eq:
            bad = (ca.astype("object").where(ca.notna(), "<N>").astype(str)
                   != cb.astype("object").where(cb.notna(), "<N>").astype(str))
            idx = bad[bad].index[:3].tolist()
            problems.append(
                f"col {c}: {int(bad.sum())} mismatches, e.g. idx={idx} "
                f"spark={ca.iloc[idx[0] if idx else 0]!r} duck={cb.iloc[idx[0] if idx else 0]!r}"
            )
    return problems
