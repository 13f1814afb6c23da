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


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64")  # unify int widths/nullables
        elif s.dtype == object:
            df[c] = s.astype(str)
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
    a, b = _normalize(sp), _normalize(duck_df)
    for c in a.columns:
        ca, cb = a[c], b[c]
        if pd.api.types.is_float_dtype(ca) and pd.api.types.is_float_dtype(cb):
            eq = (ca.fillna(-1.23e300) == cb.fillna(-1.23e300)).all()
        else:
            eq = (ca.fillna("<NULL>").astype(str) == cb.fillna("<NULL>").astype(str)).all()
        if not eq:
            bad = (ca.fillna("<N>").astype(str) != cb.fillna("<N>").astype(str))
            idx = bad[bad].index[:3].tolist()
            problems.append(
                f"col {c}: {int(bad.sum())} mismatches, e.g. idx={idx} "
                f"spark={ca.iloc[idx[0] if idx else 0]!r} duck={cb.iloc[idx[0] if idx else 0]!r}"
            )
    return problems
