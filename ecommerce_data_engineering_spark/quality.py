"""Data-quality assertion suite (SURVEY.md §2.9 Q1–Q7).

The reference ends every DAG with a validation task (staging_dag.py:
233-259, warehouse_dag.py:462-488, analytics_dag.py:465-495): row
counts, null counts on required fields, business-rule counts, orphan
FK checks, aggregate sanity values — failures raise and fail the task
(Q7), except campaign attribution which soft-fails
(analytics_dag.py:325-328), mirrored by ``soft=True``.

Each check returns its measured value so pipelines can log it; a
violated threshold raises ``QualityError`` unless soft.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


class QualityError(AssertionError):
    """A data-quality contract was violated (Q7)."""


@dataclass
class CheckResult:
    name: str
    value: float
    passed: bool


def _emit(name: str, value, passed: bool, soft: bool) -> CheckResult:
    if not passed and not soft:
        raise QualityError(f"DQ check failed: {name} (value={value})")
    return CheckResult(name, value, passed)


def check_columns(df: DataFrame, expected: list[str], name: str = "columns",
                  soft: bool = False) -> CheckResult:
    """Q1: expected-columns check (staging_dag.py:35-45)."""
    missing = [c for c in expected if c not in df.columns]
    return _emit(f"{name}:missing={missing}", len(missing), not missing, soft)


def check_row_count(df: DataFrame, at_least: int = 1, name: str = "row_count",
                    soft: bool = False) -> CheckResult:
    """Q2: row-count threshold (staging_dag.py:240-242)."""
    n = df.count()
    return _emit(name, n, n >= at_least, soft)


def check_null_count(df: DataFrame, col: str, at_most: int = 0,
                     soft: bool = False) -> CheckResult:
    """Q3: null count on a required field (staging_dag.py:243)."""
    n = df.filter(F.col(col).isNull()).count()
    return _emit(f"nulls:{col}", n, n <= at_most, soft)


def check_rule(df: DataFrame, violation: Column, name: str,
               at_most: int = 0, soft: bool = False) -> CheckResult:
    """Q4: business-rule violation count (e.g. price <= 0,
    staging_dag.py:244)."""
    n = df.filter(violation).count()
    return _emit(f"rule:{name}", n, n <= at_most, soft)


def check_referential(fact: DataFrame, dim: DataFrame, fact_key: str,
                      dim_key: str, name: str, soft: bool = False) -> CheckResult:
    """Q5: orphan-FK check via left anti join (warehouse_dag.py:473).

    Null FKs are excluded — a NULL is "anonymous", not an orphan
    (matches SQL IN/EXISTS semantics the reference relies on)."""
    orphans = (fact.filter(F.col(fact_key).isNotNull())
               .join(dim.select(F.col(dim_key).alias(fact_key)).distinct(),
                     fact_key, "left_anti")
               .count())
    return _emit(f"orphans:{name}", orphans, orphans == 0, soft)


def check_aggregate(df: DataFrame, agg: Column, name: str,
                    lo: float | None = None, hi: float | None = None,
                    soft: bool = False) -> CheckResult:
    """Q6: aggregate sanity value within [lo, hi]
    (analytics_dag.py:478-480)."""
    value = df.agg(agg.alias("v")).collect()[0]["v"]
    ok = (lo is None or (value is not None and value >= lo)) and \
         (hi is None or (value is not None and value <= hi))
    return _emit(f"agg:{name}", value, ok, soft)
