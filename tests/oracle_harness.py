"""Local replica of the driver's DuckDB-oracle differential check.

For each registered query with an oracle, run the Spark implementation and
the ANSI-SQL twin over the same parquet tables, canonicalize both frames
(sort columns by name, sort rows, µs timestamps, NaN==NULL) and compare
values exactly. This is intentionally stricter than a tolerance check —
the driver hash-compares, so only exact matches count.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from nginx_analytics_spark.sources import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.where(pd.notna(s), None)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last").reset_index(
            drop=True
        )
    return df


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if len(a) != len(b):
        problems.append(f"row count: spark={len(a)} oracle={len(b)}")
    if list(a.columns) != list(b.columns):
        problems.append(f"columns: spark={list(a.columns)} oracle={list(b.columns)}")
        return problems
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver hashes raw dtypes: an int64 Spark column vs a float64
        # oracle column (e.g. DuckDB HUGEINT -> pandas float64) mismatches
        # even when every value is numerically equal. Mirror that here.
        if pd.api.types.is_float_dtype(av) != pd.api.types.is_float_dtype(bv):
            problems.append(
                f"col {c}: dtype class mismatch: spark={av.dtype} oracle={bv.dtype}"
            )
            continue
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype("float64").to_numpy()
            bf = bv.astype("float64").to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            eq = (af == bf) | both_nan
            if not eq.all():
                idx = int(np.flatnonzero(~eq)[0])
                problems.append(
                    f"col {c}: first diff at row {idx}: "
                    f"spark={af[idx]!r} oracle={bf[idx]!r}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                idx = int(np.flatnonzero(~eq.to_numpy())[0])
                problems.append(
                    f"col {c}: first diff at row {idx}: "
                    f"spark={av.iloc[idx]!r} oracle={bv.iloc[idx]!r}"
                )
    return problems


def run_query_pair(spark, con, fn, sql, sf_dir: str):
    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = con.execute(sql).df()
    return spark_pdf, oracle_pdf, compare(spark_pdf, oracle_pdf)
