"""Local differential harness mirroring the driver's t2 check:
run the Spark query and the DuckDB oracle on the same parquet, compare
row count + column names + order-insensitive values (columns sorted by
name, rows sorted by their stringified tuple).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _norm_cell(v) -> str:
    import numpy as np

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "∅"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):          # date/datetime → midnight-normalized
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def canonical(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        out.append(tuple(_norm_cell(row[c]) for c in cols))
    return sorted(out)


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"{name}: columns differ spark={sorted(spdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}")
        return problems
    if len(spdf) != len(oracle_pdf):
        problems.append(f"{name}: rowcount spark={len(spdf)} oracle={len(oracle_pdf)}")
    a, b = canonical(spdf), canonical(oracle_pdf)
    if a != b:
        only_spark = [r for r in a if r not in set(b)][:3]
        only_oracle = [r for r in b if r not in set(a)][:3]
        problems.append(
            f"{name}: value mismatch; spark-only={only_spark} "
            f"oracle-only={only_oracle} (cols={sorted(spdf.columns)})")
    return problems
