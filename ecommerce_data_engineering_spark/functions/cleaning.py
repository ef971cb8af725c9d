"""Staging-layer cleaning transforms (SURVEY.md §2.2 P1–P5).

Reference behavior: pandas lower/strip/fillna/to_numeric(coerce)/
to_datetime/dropna in the staging DAG (staging_dag.py:59-60,102-106,
141-145).  All four are single Catalyst expressions here — no UDFs,
fully codegen'd, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def clean_string(col: Column | str) -> Column:
    """P1: ``email.str.lower().str.strip()`` → lower(trim(col))."""
    return F.lower(F.trim(col))


def fill_unknown(col: Column | str, default: str = "Unknown") -> Column:
    """P2: ``fillna('Unknown')`` → coalesce(col, lit(default))."""
    return F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(default))


def coerce_numeric(col: Column | str, to: str = "decimal(10,2)") -> Column:
    """P3: ``pd.to_numeric(errors='coerce')`` → try_cast (invalid→NULL).

    Spark 4 runs ANSI mode by default, where a plain cast *throws* on
    malformed input; ``try_cast`` restores the coerce-to-null contract.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(to)


def coerce_date(col: Column | str) -> Column:
    """P4: ``pd.to_datetime`` → try_to_timestamp/to_date (invalid→NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("date")
