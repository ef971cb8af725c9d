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


def _dtype_family(series: pd.Series) -> str:
    """Collapse a pandas dtype to the family the driver's hash is
    sensitive to.  The driver stringifies raw cells, so int64 ``699``
    vs float64 ``699.0`` hash-differ even when values are identical
    (the round-2 curation failure: DuckDB sum(BIGINT) → HUGEINT →
    float64).  _norm_cell masks that locally; this check un-masks it."""
    import numpy as np

    kind = series.dtype.kind
    if kind == "b":
        return "bool"
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind in "mM":
        return "datetime"
    # object column: classify by first non-null value
    for v in series:
        if v is None or v is pd.NaT:
            continue
        if isinstance(v, float) and math.isnan(v):
            continue
        import datetime
        import decimal
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, (bool, np.bool_)):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, datetime.datetime):
            return "datetime"
        if isinstance(v, datetime.date):
            return "date"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "list"
        return "str"
    return "all-null"


def dtype_problems(spdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                   name: str) -> list[str]:
    """Driver-strict column-type check: flag any column whose dtype
    family differs between the Spark result and the DuckDB oracle
    (e.g. oracle HUGEINT/DECIMAL where Spark emits int64/double).
    An all-null column on either side is compatible with anything."""
    out = []
    for c in sorted(set(spdf.columns) & set(oracle_pdf.columns)):
        fa, fb = _dtype_family(spdf[c]), _dtype_family(oracle_pdf[c])
        if "all-null" in (fa, fb) or fa == fb:
            continue
        # date ↔ datetime is driver-safe: campaign_attribution shipped
        # Spark DateType vs DuckDB datetime64 and hashed green in r2
        # (both normalize to midnight ISO strings).
        if {fa, fb} == {"date", "datetime"}:
            continue
        out.append(
            f"{name}: column {c!r} dtype drift spark={fa} oracle={fb} "
            f"(raw {spdf[c].dtype} vs {oracle_pdf[c].dtype}) — the driver "
            f"hashes raw cells, so this fails its compare even if values "
            f"match; CAST the oracle column to the Spark type")
    return out


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
    problems.extend(dtype_problems(spdf, oracle_pdf, name))
    a, b = canonical(spdf), canonical(oracle_pdf)
    if a != b:
        only_spark = [r for r in a if r not in set(b)][:3]
        only_oracle = [r for r in b if r not in set(a)][:3]
        problems.append(
            f"{name}: value mismatch; spark-only={only_spark} "
            f"oracle-only={only_oracle} (cols={sorted(spdf.columns)})")
    return problems
