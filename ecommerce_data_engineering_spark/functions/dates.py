"""PG-compatible date-part functions (SURVEY.md §2.2 P8–P11).

The reference computes dim_time columns with PostgreSQL EXTRACT/TO_CHAR
(warehouse_dag.py:166-177).  Spark's equivalents differ in two places
(SURVEY.md §7.4.2) — both normalized here so Spark output matches the
PG/DuckDB semantics the oracle uses:

- ``dayofweek``: Spark 1=Sunday..7=Saturday vs PG/DuckDB DOW
  0=Sunday..6=Saturday → ``pg_dow`` shifts by −1.
- ``weekofyear``: both Spark and PG/DuckDB EXTRACT(week) are ISO-8601
  week numbers; no shift needed (verified on year boundaries in tests).
- ``TO_CHAR(d,'Day')`` blank-pads to 9 chars in PG; we standardize on
  the *unpadded* name (DuckDB ``dayname`` behavior) and document the
  deviation — the DDL truncates to VARCHAR(10) anyway (init.sql:195).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def date_key(col: Column | str) -> Column:
    """Smart int key yyyyMMdd — TO_CHAR(d,'YYYYMMDD')::INTEGER
    (warehouse_dag.py:166,214)."""
    return F.date_format(col, "yyyyMMdd").cast("int")


def pg_dow(col: Column | str) -> Column:
    """PostgreSQL EXTRACT(DOW): 0=Sunday..6=Saturday."""
    return (F.dayofweek(col) - F.lit(1)).cast("int")


def day_name(col: Column | str) -> Column:
    """Full day name ('Monday'); locale-independent English."""
    return F.date_format(col, "EEEE")


def month_name(col: Column | str) -> Column:
    """Full month name ('January')."""
    return F.date_format(col, "MMMM")


def is_weekend(col: Column | str) -> Column:
    """CASE WHEN EXTRACT(DOW) IN (0,6) (warehouse_dag.py:177)."""
    return pg_dow(col).isin(0, 6)
